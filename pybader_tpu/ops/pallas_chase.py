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


def _make_kernel(nx, ny, nz, bx, by, halo, n_payloads=1, early_exit=True):
    """Kernel factory; n_payloads int32 arrays are chased with shared codes.

    Payload 0 is the pointer array (convergence is tested on it — its chain
    values never repeat before the root); extra payloads (e.g. dense basin
    labels seeded at the maxima) ride along through identical roll-selects.
    """
    rx = bx + 2 * halo
    ry = by + 2 * halo

    def kernel(flags_ref, *refs):
        p_any = refs[:n_payloads]
        bk_any = refs[n_payloads]
        out_refs = refs[n_payloads + 1:2 * n_payloads + 1]
        done_ref = refs[2 * n_payloads + 1]
        p_loc = refs[2 * n_payloads + 2:3 * n_payloads + 2]
        bk_loc = refs[3 * n_payloads + 2]
        bk32_loc = refs[3 * n_payloads + 3]
        sems = refs[3 * n_payloads + 4]
        i = pl.program_id(0)
        j = pl.program_id(1)
        gy = pl.num_programs(1)
        active = flags_ref[i * gy + j] > jnp.int32(0)
        x0 = i * np.int32(bx)
        y0 = j * np.int32(by)

        @pl.when(jnp.logical_not(active))
        def _copy_through():
            cps = [
                pltpu.make_async_copy(
                    p_any[m].at[pl.ds(pl.multiple_of(x0, 8), bx),
                                pl.ds(pl.multiple_of(y0, 8), by), :],
                    out_refs[m],
                    sems.at[jnp.int32(m)],
                )
                for m in range(n_payloads)
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            # status 0: converged, output unchanged (see the work branch)
            done_ref[:] = jnp.zeros((8, 128), dtype=jnp.int32)

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
            srcs = list(p_any) + [bk_any]
            dsts = list(p_loc) + [bk_loc]
            for (sx, lx, dx) in xs:
                for (sy, ly, dy) in ys:
                    for src, dst in zip(srcs, dsts):
                        copies.append(pltpu.make_async_copy(
                            src.at[pl.ds(sx, lx), pl.ds(sy, ly), :],
                            dst.at[pl.ds(dx, lx), pl.ds(dy, ly), :],
                            sems.at[jnp.int32(c)],
                        ))
                        c += 1
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            # widen the step codes once per block (v5e vector compares are
            # 32-bit only; widening inside the pass loop costs 27 converts
            # per pass)
            bk32_loc[:] = bk_loc[:].astype(jnp.int32)

            # One pass: out[i] = a[i + off(bk[i])] for every payload.
            # Nested fori loops serialise the rolls (a flat unrolled version
            # keeps all 26 rolled copies alive and OOMs VMEM) and reuse
            # partial x/y rolls.  Offset code k = (ox+1)*9 + (oy+1)*3 +
            # (oz+1); k == 13 is the self step and harmlessly selects the
            # input itself.  All shapes stay (8,128)-tile-aligned and all
            # neighbour access is pltpu.roll — misaligned static slices
            # blow up Mosaic compilation.
            def one_pass(vals):
                def over_dx(kx, outs):
                    sx = jax.lax.rem(jnp.int32(rx) + jnp.int32(1) - kx,
                                     jnp.int32(rx))
                    vx = tuple(pltpu.roll(v, sx, 0) for v in vals)

                    def over_dy(ky, outs2):
                        sy = jax.lax.rem(jnp.int32(ry) + jnp.int32(1) - ky,
                                         jnp.int32(ry))
                        vxy = tuple(pltpu.roll(v, sy, 1) for v in vx)
                        base = kx * jnp.int32(9) + ky * jnp.int32(3)
                        for kz, dz in enumerate((-1, 0, 1)):
                            m = bk32_loc[:] == base + jnp.int32(kz)
                            new_outs = []
                            for v, o in zip(vxy, outs2):
                                if dz:
                                    r = pltpu.roll(
                                        v, np.int32((-dz) % nz), 2)
                                else:
                                    r = v
                                new_outs.append(jnp.where(m, r, o))
                            outs2 = tuple(new_outs)
                        return outs2

                    return jax.lax.fori_loop(
                        jnp.int32(0), jnp.int32(3), over_dy, outs)

                return jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(3), over_dx, vals)

            # Ring restore: the x/y rolls wrap around the buffer, writing
            # garbage into the outermost layer each pass; restoring that
            # ring from the loaded snapshot keeps every value a valid
            # ``parent^t`` composition, so the pass count is NOT capped at
            # the halo depth — in-block chains converge fully within one
            # sweep (fresh cross-block information still enters halo-deep
            # per sweep).  z needs no ring: the full column wraps
            # physically.
            ix = jax.lax.broadcasted_iota(jnp.int32, (rx, ry, nz), 0)
            iy = jax.lax.broadcasted_iota(jnp.int32, (rx, ry, nz), 1)
            ring = ((ix == 0) | (ix == jnp.int32(rx - 1))
                    | (iy == 0) | (iy == jnp.int32(ry - 1)))
            vals0 = tuple(ref[:] for ref in p_loc)
            max_passes = 4 * halo if early_exit else halo

            # state: (t, last pass changed?, ANY pass changed?, values).
            # ``done`` must mean "this sweep changed nothing" (output ==
            # input): a block that changed and then locally converged must
            # still report not-done, or its neighbours would never see its
            # new halo values and could terminate on stale compositions.
            def cond(state):
                t, changed, _, _ = state
                return jnp.logical_and(t < jnp.int32(max_passes),
                                       changed > jnp.int32(0))

            def body(state):
                t, _, any_changed, vals = state
                new = one_pass(vals)
                new = tuple(jnp.where(ring, v0, nv)
                            for v0, nv in zip(vals0, new))
                if early_exit:
                    # convergence is exact on the pointer payload only
                    diff = (
                        new[0][halo:halo + bx, halo:halo + by, :]
                        != vals[0][halo:halo + bx, halo:halo + by, :]
                    )
                    changed = jnp.max(
                        jnp.where(diff, jnp.int32(1), jnp.int32(0)))
                else:
                    # replay mode: fixed pass count (label payloads can
                    # stall mid-chain and would falsely early-exit)
                    changed = jnp.int32(1)
                return (t + jnp.int32(1), changed,
                        jnp.maximum(any_changed, changed), new)

            _, last_changed, any_changed, vals = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(1), jnp.int32(0),
                             vals0)
            )
            if not early_exit:
                any_changed = jnp.int32(0)
                last_changed = jnp.int32(0)
            for m in range(n_payloads):
                out_refs[m][:] = vals[m][halo:halo + bx, halo:halo + by, :]
            # 2-bit status: bit1 = output changed this sweep (neighbours
            # must re-run to see the new halo), bit0 = not locally
            # converged (this block itself must re-run).  A block that
            # changed and then converged re-runs only when a neighbour
            # changes — its local fixed point is valid until its halo does.
            done_ref[:] = jnp.full(
                (8, 128), any_changed * jnp.int32(2) + last_changed,
                dtype=jnp.int32)

    return kernel, rx, ry


@partial(jax.jit, static_argnames=("bx", "by", "halo", "early_exit"))
def chase_sweep(a, bk, flags, bx, by, halo, early_exit=True):
    """One haloed multi-pass sweep over the grid (pointer payload only)."""
    (out,), done = _chase_sweep_multi((a,), bk, flags, bx, by, halo,
                                      early_exit)
    return out, done


def _chase_sweep_multi(payloads, bk, flags, bx, by, halo, early_exit=True):
    """Shared driver: payloads is a tuple of int32 grids (pointers first).

    args:
        bk: (nx,ny,nz) uint8 step codes.
        flags: (gx*gy,) int32; blocks with flag 0 are copied through
               untouched and report done.
    returns (payload outputs tuple, done block map (gx*8, gy*128) int32,
    sliced [::8, ::128] for the per-block value).
    """
    m = len(payloads)
    nx, ny, nz = payloads[0].shape
    kernel, rx, ry = _make_kernel(nx, ny, nz, bx, by, halo, n_payloads=m,
                                  early_exit=early_exit)
    grid = (nx // bx, ny // by)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (m + 1),
        out_specs=(
            tuple(
                pl.BlockSpec((bx, by, nz), lambda i, j, *_: (i, j, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(m)
            )
            + (pl.BlockSpec((8, 128), lambda i, j, *_: (i, j),
                            memory_space=pltpu.VMEM),)
        ),
        scratch_shapes=[pltpu.VMEM((rx, ry, nz), jnp.int32)] * m + [
            pltpu.VMEM((rx, ry, nz), jnp.uint8),
            pltpu.VMEM((rx, ry, nz), jnp.int32),
            pltpu.SemaphoreType.DMA((9 * (m + 1),)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            tuple(jax.ShapeDtypeStruct((nx, ny, nz), jnp.int32)
                  for _ in range(m))
            + (jax.ShapeDtypeStruct(
                (grid[0] * 8, grid[1] * 128), jnp.int32),)
        ),
        # v5e has 128 MiB of VMEM; the default Mosaic budget is far smaller
        # and rejects the (16,16,8) config at nz=512
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(flags, *payloads, bk)
    return outs[:m], outs[m]


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
def _next_flags(done, can_change):
    """2-bit status block map -> next sweep's active flags.

    bit1 (changed): the block's output moved this sweep — its 3x3
    neighbours re-run to read the new halo.  bit0 (not converged): the
    block itself re-runs.  Blocks with no non-self step code anywhere
    (``can_change`` False) are never activated: every pass maps their
    values to themselves, so they are converged from birth and their halo
    contribution is constant.
    """
    v = done[::8, ::128]
    changed_b = v >= 2
    notconv_b = (v & 1) > 0
    flags = (_dilate_blocks(changed_b) | notconv_b) & can_change
    return flags.reshape(-1).astype(jnp.int32), jnp.any(flags)


@partial(jax.jit, static_argnames=("bx", "by"))
def _block_can_change(best_k, bx, by):
    """(gx, gy) bool: block contains any non-self step code."""
    nx, ny, nz = best_k.shape
    nonself = (best_k != jnp.uint8(13)).reshape(
        nx // bx, bx, ny // by, by, nz)
    return jnp.any(nonself, axis=(1, 3, 4))


def _run_chase(parent, best_k, bx, by, h, max_sweeps):
    nx, ny, nz = parent.shape
    a = parent
    can_change = _block_can_change(best_k, bx, by)
    flags = can_change.reshape(-1).astype(jnp.int32)
    if not bool(jnp.any(flags)):
        return a
    for _ in range(max_sweeps):
        a, done = chase_sweep(a, best_k, flags, bx, by, h)
        flags, any_active = _next_flags(done, can_change)
        if not bool(any_active):
            break
    return a


def _try_configs(configs, shape, run):
    """Run ``run(bx, by, h)`` under the first config that fits VMEM.

    Compile/VMEM failures (RuntimeError — Mosaic raises through
    JaxRuntimeError) fall through to the next, smaller config with a logged
    warning; anything else propagates.
    """
    import warnings

    nx, ny, _ = shape
    last_err = None
    for bt_x, bt_y, h0 in configs:
        bx = _pick_block(nx, bt_x)
        by = _pick_block(ny, bt_y)
        h = min(h0, bx, by)
        if bx % 8 or by % 8 or h % 8:
            continue
        try:
            return run(bx, by, h)
        except RuntimeError as e:  # VMEM overflow at compile: try smaller
            warnings.warn(
                f"chase config ({bx},{by},{h}) failed to compile "
                f"({e}); retrying smaller", RuntimeWarning,
            )
            last_err = e
    raise last_err


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
        # halo and blocks must stay multiples of 8 (DMA tile alignment);
        # measured on v5e: fine blocks win at <=384^3 (skip-flag granularity)
        # while bigger blocks win at 512^3 (halo redundancy dominates)
        if nx * ny * nz >= 512 ** 3:
            configs = ((64, 32, 8), (32, 32, 8), (16, 16, 8),
                       (16, 8, 8), (8, 8, 8))
        else:
            configs = ((block_target, block_target, halo),
                       (16, 8, 8), (8, 8, 8))
        return _try_configs(
            configs, parent.shape,
            lambda bx, by, h: _run_chase(parent, best_k, bx, by, h,
                                         max_sweeps),
        )


TAG = jnp.int32(1 << 28)  # flat indices < 2^27 (512^3), labels < 2^27


@partial(jax.jit, static_argnames=("has_vacuum",))
def _oneshot_seed(best_k, vacuum, has_vacuum):
    """Fused seed construction: one program, minimal live intermediates."""
    from pybader_tpu.ops.reductions import cumsum_blocked

    shape = best_k.shape
    nx, ny, nz = shape
    is_self = best_k == jnp.uint8(13)
    is_max = (is_self & ~vacuum) if has_vacuum else is_self
    flat_max = is_max.reshape(-1)
    ranks = (cumsum_blocked(flat_max.astype(jnp.int32)) - 1).reshape(shape)
    n_maxima = jnp.sum(flat_max.astype(jnp.int32))
    x = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    y = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    z = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    self_idx = (x * ny + y) * nz + z
    seed = jnp.where(is_max, TAG | ranks, self_idx)
    if has_vacuum:
        seed = jnp.where(vacuum, TAG | n_maxima, seed)
    return seed, n_maxima


def labels_oneshot(best_k, vacuum=None, **kw):
    """Dense basin labels in ONE chase: seed maxima, propagate downhill.

    The chase kernel moves *values* along the static bk-coded parent edges,
    so seeding maxima with tag-bit-marked label ids and every other voxel
    with its own flat index converges each voxel to its root's label.  The
    tag bit keeps pre-arrival values (injective pointer compositions) and
    labels in disjoint ranges, so the kernel's exact convergence test still
    holds, and a label front adjacent to any block forces a change there —
    no block can stall undone.

    Labels are numbered by maximum flat index (ascending).  Vacuum voxels
    (self-step) keep a sentinel and come back as -1.

    returns (labels int32 grid, n_maxima int).
    """
    shape = best_k.shape
    with jax.enable_x64(False):
        has_vac = vacuum is not None
        # best_k doubles as an (unused, DCE'd) dummy when there is no vacuum
        seed, n_max_dev = _oneshot_seed(
            best_k, vacuum if has_vac else best_k, has_vac,
        )
        n_maxima = int(n_max_dev)
        sentinel = jnp.int32(n_maxima)
        nx_, ny_, nz_ = shape
        if nx_ * ny_ * nz_ >= 512 ** 3:
            configs = ((64, 32, 8), (32, 32, 8), (16, 16, 8),
                       (16, 8, 8), (8, 8, 8))
        else:
            configs = ((16, 16, 8), (16, 8, 8), (8, 8, 8))
        out = _try_configs(
            configs, shape,
            lambda bx, by, h: _run_chase(seed, best_k, bx, by, h, 4096),
        )
        labels = out & (TAG - 1)
        labels = jnp.where(labels == sentinel, jnp.int32(-1), labels)
    return labels, n_maxima
