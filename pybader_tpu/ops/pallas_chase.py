"""Pallas TPU kernel: pointer-chain resolution without gathers.

Motivation (measured on v5e): XLA's flat gather runs at ~45M lookups/s, so
classic pointer doubling (``p = p[p]``, 6+ rounds on 10^8 voxels) costs
seconds.  TPUs have no fast random access — but the ascent pointers produced
by :func:`pybader_tpu.ops.stencil.ongrid_parent` always point at one of the
26 *neighbours*.  The composition

    A'[i] = A[parent[i]]        (prepend one ascent step)

is therefore a pure 26-neighbour stencil: roll A by each offset and select by
the per-voxel step code ``best_k``.  This kernel runs many such passes per
HBM round-trip inside VMEM (block + halo, one pass consumes one halo layer),
with two levels of adaptivity:

 - per-block early exit: a block stops iterating once a pass changes none of
   its centre values;
 - sweep-level skip flags (scalar-prefetched): blocks that converged and
   whose neighbours all converged are copied through without loading halos
   or running any pass, so late sweeps only touch the few blocks still
   carrying long chains (ridge lines).

Invariant making stale halos safe: every intermediate value is a valid
``parent^t[i]`` for some t >= 1; passes only increase t, values along a
chain never repeat before reaching the root (strict ascent, no cycles), and
the unique fixed point is the root (roots are self-parents).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pybader_tpu.grid import OFFSETS, SELF_INDEX  # noqa: F401  (re-export)


def _pick_block(n: int, target: int) -> int:
    for b in range(min(target, n), 0, -1):
        if n % b == 0:
            return b
    return n


def _make_kernel(nx, ny, nz, bx, by, halo):
    rx = bx + 2 * halo
    ry = by + 2 * halo

    def kernel(flags_ref, a_any, bk_any, out_ref, done_ref,
               a_loc, bk_loc, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        gy = pl.num_programs(1)
        active = flags_ref[i * gy + j] > jnp.int32(0)
        x0 = i * np.int32(bx)
        y0 = j * np.int32(by)

        @pl.when(jnp.logical_not(active))
        def _copy_through():
            cp = pltpu.make_async_copy(
                a_any.at[pl.ds(pl.multiple_of(x0, 8), bx),
                         pl.ds(pl.multiple_of(y0, 8), by), :],
                out_ref,
                sems.at[jnp.int32(0)],
            )
            cp.start()
            cp.wait()
            done_ref[:] = jnp.full((8, 128), jnp.int32(1), dtype=jnp.int32)

        @pl.when(active)
        def _work():
            # --- halo load: 3x3 chunks with periodic wrap (static sizes);
            # chunk starts are multiples of the sublane tiling (halo and
            # block sizes are multiples of 8) — pl.multiple_of proves it
            def wrap(v, n):
                return jax.lax.rem(v + np.int32(n), np.int32(n))

            xs = [(wrap(x0 - np.int32(halo), nx), halo, 0),
                  (x0, bx, halo),
                  (wrap(x0 + np.int32(bx), nx), halo, halo + bx)]
            ys = [(wrap(y0 - np.int32(halo), ny), halo, 0),
                  (y0, by, halo),
                  (wrap(y0 + np.int32(by), ny), halo, halo + by)]
            xs = [(pl.multiple_of(s, 8), l, d) for (s, l, d) in xs]
            ys = [(pl.multiple_of(s, 8), l, d) for (s, l, d) in ys]
            copies = []
            c = 0
            for (sx, lx, dx) in xs:
                for (sy, ly, dy) in ys:
                    copies.append(pltpu.make_async_copy(
                        a_any.at[pl.ds(sx, lx), pl.ds(sy, ly), :],
                        a_loc.at[pl.ds(dx, lx), pl.ds(dy, ly), :],
                        sems.at[jnp.int32(c)],
                    ))
                    c += 1
                    copies.append(pltpu.make_async_copy(
                        bk_any.at[pl.ds(sx, lx), pl.ds(sy, ly), :],
                        bk_loc.at[pl.ds(dx, lx), pl.ds(dy, ly), :],
                        sems.at[jnp.int32(c)],
                    ))
                    c += 1
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            # v5e vector compare is 32-bit only: widen the uint8 codes once
            bk = bk_loc[:].astype(jnp.int32)

            # One pass: out[i] = a[i + off(bk[i])].  Nested fori loops
            # serialise the rolls (a flat unrolled version keeps all 26
            # rolled copies alive and OOMs VMEM) and reuse partial x/y
            # rolls: 30 rolls/pass instead of 81.  Offset code
            # k = (ox+1)*9 + (oy+1)*3 + (oz+1); k == 13 is the self step
            # and harmlessly selects `a` itself.
            def one_pass(a):
                def over_dx(kx, out):
                    sx = jax.lax.rem(jnp.int32(rx) + jnp.int32(1) - kx,
                                     jnp.int32(rx))
                    ax = pltpu.roll(a, sx, 0)

                    def over_dy(ky, out2):
                        sy = jax.lax.rem(jnp.int32(ry) + jnp.int32(1) - ky,
                                         jnp.int32(ry))
                        axy = pltpu.roll(ax, sy, 1)
                        base = kx * jnp.int32(9) + ky * jnp.int32(3)
                        for kz, dz in enumerate((-1, 0, 1)):
                            if dz:
                                r = pltpu.roll(axy, np.int32((-dz) % nz), 2)
                            else:
                                r = axy
                            out2 = jnp.where(
                                bk == base + jnp.int32(kz), r, out2)
                        return out2

                    return jax.lax.fori_loop(
                        jnp.int32(0), jnp.int32(3), over_dy, out)

                return jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(3), over_dx, a)

            def cond(state):
                t, changed = state
                return jnp.logical_and(t < jnp.int32(halo),
                                       changed > jnp.int32(0))

            def body(state):
                t, _ = state
                a = a_loc[:]
                new = one_pass(a)
                a_loc[:] = new
                diff = (
                    new[halo:halo + bx, halo:halo + by, :]
                    != a[halo:halo + bx, halo:halo + by, :]
                )
                changed = jnp.max(
                    jnp.where(diff, jnp.int32(1), jnp.int32(0)))
                return t + jnp.int32(1), changed

            _, changed = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(1))
            )
            out_ref[:] = a_loc[halo:halo + bx, halo:halo + by, :]
            done_ref[:] = jnp.full((8, 128), jnp.int32(1) - changed,
                                   dtype=jnp.int32)

    return kernel, rx, ry


@partial(jax.jit, static_argnames=("bx", "by", "halo"))
def chase_sweep(a, bk, flags, bx, by, halo):
    """One haloed multi-pass sweep over the grid.

    args:
        bk: (nx,ny,nz) uint8 step codes.
        flags: (gx*gy,) int32; blocks with flag 0 are copied through
               untouched and report done.
    returns (new_a, done) with done an (gx*8, gy*128) int32 block map
    (sliced [::8, ::128] for the per-block value).
    """
    nx, ny, nz = a.shape
    kernel, rx, ry = _make_kernel(nx, ny, nz, bx, by, halo)
    grid = (nx // bx, ny // by)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((bx, by, nz), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rx, ry, nz), jnp.int32),
            pltpu.VMEM((rx, ry, nz), jnp.uint8),
            pltpu.SemaphoreType.DMA((18,)),
        ],
    )
    out, done = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, nz), jnp.int32),
            jax.ShapeDtypeStruct((grid[0] * 8, grid[1] * 128), jnp.int32),
        ),
    )(flags, a, bk)
    return out, done


def _dilate_blocks(notdone):
    """3x3 periodic block-level dilation of the not-done mask."""
    out = notdone
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            out = out | jnp.roll(notdone, (dx, dy), axis=(0, 1))
    return out


@jax.jit
def step_code_from_parent(parent: jax.Array) -> jax.Array:
    """Recover the OFFSETS step code (uint8) from a one-step pointer array."""
    nx, ny, nz = parent.shape
    x = jax.lax.broadcasted_iota(jnp.int32, parent.shape, 0)
    y = jax.lax.broadcasted_iota(jnp.int32, parent.shape, 1)
    z = jax.lax.broadcasted_iota(jnp.int32, parent.shape, 2)
    px = parent // (ny * nz)
    py = (parent // nz) % ny
    pz = parent % nz
    ox = jnp.remainder(px - x + 1, nx) - 1
    oy = jnp.remainder(py - y + 1, ny) - 1
    oz = jnp.remainder(pz - z + 1, nz) - 1
    return ((ox + 1) * 9 + (oy + 1) * 3 + (oz + 1)).astype(jnp.uint8)


def supports_shape(shape) -> bool:
    """Whether the chase kernel supports this grid shape.

    Blocks and halos must be multiples of 8 for tile-aligned DMA.
    """
    nx, ny, nz = shape
    return (
        _pick_block(nx, 8) % 8 == 0
        and _pick_block(ny, 8) % 8 == 0
        and nz % 128 == 0
    )


@partial(jax.jit, static_argnames=())
def _next_flags(done):
    """done block map -> next sweep's active flags (3x3 block dilation)."""
    done_b = done[::8, ::128] > 0
    nd = ~done_b
    flags = _dilate_blocks(nd) | nd
    return flags.reshape(-1).astype(jnp.int32), jnp.any(nd)


def _run_chase(parent, best_k, bx, by, h, max_sweeps):
    nx, ny, nz = parent.shape
    gx, gy = nx // bx, ny // by
    a = parent
    flags = jnp.ones((gx * gy,), dtype=jnp.int32)
    for _ in range(max_sweeps):
        a, done = chase_sweep(a, best_k, flags, bx, by, h)
        flags, any_nd = _next_flags(done)
        if not bool(any_nd):
            break
    return a


def resolve_roots_pallas(parent, best_k, max_sweeps: int = 4096,
                         block_target: int = 16, halo: int = 8):
    """Resolve ascent pointers to roots using the Pallas chase kernel.

    Host-driven sweep loop (a lax.while_loop driver measured ~4x slower on
    the v5e, likely defeating buffer donation across sweeps).  Falls back to
    smaller halos/blocks if a configuration exceeds VMEM.

    args:
        parent: (nx,ny,nz) int32 one-step ascent pointers (flat indices).
        best_k: (nx,ny,nz) uint8 step codes in OFFSETS order (13 == self).
    returns:
        (nx,ny,nz) int32 roots.
    """
    nx, ny, nz = parent.shape

    # trace under 32-bit mode: the kernel is all-explicit 32-bit, and x64
    # tracing leaks i64 scalars Mosaic cannot legalize
    with jax.enable_x64(False):
        bk8 = best_k
        last_err = None
        # halo and blocks must stay multiples of 8 (DMA tile alignment)
        for bt_x, bt_y, h0 in ((block_target, block_target, halo),
                               (16, 8, 8), (8, 8, 8)):
            bx = _pick_block(nx, bt_x)
            by = _pick_block(ny, bt_y)
            h = min(h0, bx, by)
            if bx % 8 or by % 8 or h % 8:
                continue
            try:
                return _run_chase(parent, bk8, bx, by, h, max_sweeps)
            except Exception as e:  # VMEM overflow at compile: try smaller
                last_err = e
        raise last_err
