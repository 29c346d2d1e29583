"""Pallas TPU kernel: pointer-chain resolution without gathers.

Motivation (measured on v5e): XLA's flat gather runs at ~45M lookups/s, so
classic pointer doubling (``p = p[p]``, 6+ rounds on 10^8 voxels) costs
seconds.  TPUs have no fast random access — but the ascent pointers produced
by :func:`pybader_tpu.ops.stencil.ongrid_parent` always point at one of the
26 *neighbours*.  The composition

    A'[i] = A[parent[i]]        (prepend one ascent step)

is therefore a pure 26-neighbour stencil: roll A by each offset and select by
the per-voxel step code ``best_k``.  This kernel runs many such passes per
HBM round-trip inside VMEM (block + halo), with two levels of adaptivity:

 - per-block early exit: a block stops iterating once a pass changes none of
   its centre values;
 - sweep-level skip flags (scalar-prefetched): blocks that converged and
   whose neighbours all converged are copied through without loading halos
   or running any pass, so late sweeps only touch the few blocks still
   carrying long chains (ridge lines).

Two value semantics ride the same kernel:

 - **pointer composition** (:func:`resolve_roots_pallas`): values start as
   one-step parents; every intermediate value is a valid ``parent^t[i]``
   for some t >= 1, passes only advance t, values along a chain never
   repeat before the root (strict ascent, no cycles), and the unique fixed
   point is the root.  Stale halos can only delay convergence.
 - **label flooding** (:func:`labels_oneshot`): maxima are seeded with
   their 1-based label, everything else with 0.  A voxel's value changes
   at most once (0 -> its root's label, the first non-zero value its
   parent chain delivers — correct because each chain leads to exactly one
   root), so values are monotone and stale halos are again merely late.
   Flooding makes pre-front blocks free: an unlabeled region changes
   nothing, early-exits after one pass, and sleeps until a neighbour's
   change flag wakes it — where composition semantics burned dozens of
   passes composing pointers nobody would ever read.
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


def _make_kernel(nx, ny, nz, bx, by, halo, max_passes, alias=False,
                 reverse=False):
    """Single-payload chase kernel factory.

    ``alias``: the payload output aliases the input buffer (in-place
    sweep).  Inactive blocks then write nothing (their data is already in
    place), and active blocks DMA their result back into the same HBM
    buffer — so blocks later in the grid order read *fresh* halo values
    from earlier blocks (Gauss-Seidel instead of Jacobi), which is safe
    for both value semantics (monotone / strictly-advancing), and the
    copy-through bandwidth of sleepy sweeps disappears.

    ``reverse``: iterate tiles in descending order, so fronts that
    propagate against the grid order also collapse within one sweep when
    alternated (forward, backward, forward, ...).
    """
    rx = bx + 2 * halo
    ry = by + 2 * halo

    def kernel(flags_ref, p_any, bk_any, out_ref, done_ref,
               p_loc, bk_loc, bk32_loc, out_blk, sems):
        gi = pl.program_id(0)
        gj = pl.program_id(1)
        gx = pl.num_programs(0)
        gy = pl.num_programs(1)
        if reverse:
            i = gx - 1 - gi
            j = gy - 1 - gj
        else:
            i, j = gi, gj
        active = flags_ref[i * gy + j] > jnp.int32(0)
        x0 = i * np.int32(bx)
        y0 = j * np.int32(by)

        @pl.when(jnp.logical_not(active))
        def _copy_through():
            if not alias:
                cp = pltpu.make_async_copy(
                    p_any.at[pl.ds(pl.multiple_of(x0, 8), bx),
                             pl.ds(pl.multiple_of(y0, 8), by), :],
                    out_ref,
                    sems.at[jnp.int32(0)],
                )
                cp.start()
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
            for (sx, lx, dx) in xs:
                for (sy, ly, dy) in ys:
                    for src, dst in ((p_any, p_loc), (bk_any, bk_loc)):
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

            # One pass: out[i] = a[i + off(bk[i])].  Nested fori loops
            # serialise the rolls (a flat unrolled version keeps all 26
            # rolled copies alive and OOMs VMEM) and reuse partial x/y
            # rolls.  Offset code k = (ox+1)*9 + (oy+1)*3 + (oz+1);
            # k == 13 is the self step and harmlessly selects the input
            # itself.  All shapes stay (8,128)-tile-aligned and all
            # neighbour access is pltpu.roll — misaligned static slices
            # blow up Mosaic compilation.
            def one_pass(vals):
                def over_dx(kx, outs):
                    sx = jax.lax.rem(jnp.int32(rx) + jnp.int32(1) - kx,
                                     jnp.int32(rx))
                    vx = pltpu.roll(vals, sx, 0)

                    def over_dy(ky, outs2):
                        sy = jax.lax.rem(jnp.int32(ry) + jnp.int32(1) - ky,
                                         jnp.int32(ry))
                        vxy = pltpu.roll(vx, sy, 1)
                        base = kx * jnp.int32(9) + ky * jnp.int32(3)
                        for kz, dz in enumerate((-1, 0, 1)):
                            m = bk32_loc[:] == base + jnp.int32(kz)
                            if dz:
                                r = pltpu.roll(vxy, np.int32((-dz) % nz), 2)
                            else:
                                r = vxy
                            outs2 = jnp.where(m, r, outs2)
                        return outs2

                    return jax.lax.fori_loop(
                        jnp.int32(0), jnp.int32(3), over_dy, outs)

                return jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(3), over_dx, vals)

            # Ring restore: the x/y rolls wrap around the buffer, writing
            # garbage into the outermost layer each pass; restoring that
            # ring from the loaded snapshot keeps every value valid under
            # both semantics, so the pass count is NOT capped at the halo
            # depth — in-block chains converge fully within one sweep
            # (fresh cross-block information still enters halo-deep per
            # sweep).  z needs no ring: the full column wraps physically.
            ix = jax.lax.broadcasted_iota(jnp.int32, (rx, ry, nz), 0)
            iy = jax.lax.broadcasted_iota(jnp.int32, (rx, ry, nz), 1)
            ring = ((ix == 0) | (ix == jnp.int32(rx - 1))
                    | (iy == 0) | (iy == jnp.int32(ry - 1)))
            vals0 = p_loc[:]

            # state: (t, last pass changed?, ANY pass changed?, values).
            # ``done`` must mean "this sweep changed nothing" (output ==
            # input): a block that changed and then locally converged must
            # still report not-done, or its neighbours would never see its
            # new halo values and could terminate on stale values.
            def cond(state):
                t, changed, _, _ = state
                return jnp.logical_and(t < jnp.int32(max_passes),
                                       changed > jnp.int32(0))

            def body(state):
                t, _, any_changed, vals = state
                new = one_pass(vals)
                new = jnp.where(ring, vals0, new)
                diff = (
                    new[halo:halo + bx, halo:halo + by, :]
                    != vals[halo:halo + bx, halo:halo + by, :]
                )
                changed = jnp.max(
                    jnp.where(diff, jnp.int32(1), jnp.int32(0)))
                return (t + jnp.int32(1), changed,
                        jnp.maximum(any_changed, changed), new)

            _, last_changed, any_changed, vals = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(1), jnp.int32(0),
                             vals0)
            )
            if alias:
                # write back in place; wait before the block ends so the
                # next tile's halo load observes it (and a mid-flight read
                # would be harmless anyway: both old and new values are
                # valid under the monotone/advancing semantics)
                out_blk[:] = vals[halo:halo + bx, halo:halo + by, :]
                cp = pltpu.make_async_copy(
                    out_blk,
                    out_ref.at[pl.ds(pl.multiple_of(x0, 8), bx),
                               pl.ds(pl.multiple_of(y0, 8), by), :],
                    sems.at[jnp.int32(0)],
                )
                cp.start()
                cp.wait()
            else:
                out_ref[:] = vals[halo:halo + bx, halo:halo + by, :]
            # 2-bit status: bit1 = output changed this sweep (neighbours
            # must re-run to see the new halo), bit0 = not locally
            # converged (this block itself must re-run).  A block that
            # changed and then converged re-runs only when a neighbour
            # changes — its local fixed point is valid until its halo does.
            done_ref[:] = jnp.full(
                (8, 128), any_changed * jnp.int32(2) + last_changed,
                dtype=jnp.int32)

    return kernel, rx, ry


def _chase_sweep_impl(a, bk, flags, bx, by, halo, max_passes=0,
                      alias=False, reverse=False):
    """One haloed multi-pass sweep over the grid.

    args:
        a: (nx,ny,nz) int32 values (pointer compositions or flood labels).
        bk: (nx,ny,nz) uint8 step codes.
        flags: (gx*gy,) int32; blocks with flag 0 are copied through
               untouched (alias: left in place) and report done.
        max_passes: in-block pass budget per sweep; 0 means 4*halo.
        alias / reverse: see :func:`_make_kernel`.
    returns (new values, done block map (gx*8, gy*128) int32, sliced
    [::8, ::128] for the per-block 2-bit status).
    """
    nx, ny, nz = a.shape
    if max_passes == 0:
        max_passes = 4 * halo
    kernel, rx, ry = _make_kernel(nx, ny, nz, bx, by, halo, max_passes,
                                  alias, reverse)
    grid = (nx // bx, ny // by)
    if reverse:
        done_map = lambda i, j, *_: (grid[0] - 1 - i, grid[1] - 1 - j)  # noqa: E731,E501
        out_map = lambda i, j, *_: (grid[0] - 1 - i, grid[1] - 1 - j, 0)  # noqa: E731,E501
    else:
        done_map = lambda i, j, *_: (i, j)  # noqa: E731
        out_map = lambda i, j, *_: (i, j, 0)  # noqa: E731
    if alias:
        payload_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        payload_spec = pl.BlockSpec((bx, by, nz), out_map,
                                    memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(
            payload_spec,
            pl.BlockSpec((8, 128), done_map, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rx, ry, nz), jnp.int32),
            pltpu.VMEM((rx, ry, nz), jnp.uint8),
            pltpu.VMEM((rx, ry, nz), jnp.int32),
            pltpu.VMEM((bx, by, nz), jnp.int32),
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
        # input 0 is the scalar-prefetch flags; input 1 is the payload
        input_output_aliases={1: 0} if alias else {},
        # v5e has 128 MiB of VMEM; the default Mosaic budget is far smaller
        # and rejects the (16,16,8) config at nz=512
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(flags, a, bk)
    return out, done


# the flood path donates the payload (the alias kernel updates it in
# place); the pointer path must NOT donate — callers hold views of the
# parent buffer (e.g. parent_flat in the refinement driver)
chase_sweep = partial(jax.jit, static_argnames=(
    "bx", "by", "halo", "max_passes", "alias", "reverse"))(
    _chase_sweep_impl)
chase_sweep_inplace = partial(jax.jit, static_argnames=(
    "bx", "by", "halo", "max_passes", "alias", "reverse"),
    donate_argnums=(0,))(_chase_sweep_impl)


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


@partial(jax.jit, static_argnames=("bx", "by"))
def _block_any(mask, bx, by):
    """(gx, gy) bool: block contains any True voxel."""
    nx, ny, nz = mask.shape
    return jnp.any(mask.reshape(nx // bx, bx, ny // by, by, nz),
                   axis=(1, 3, 4))


def _run_chase(a, best_k, bx, by, h, max_sweeps, init_active=None,
               progress=None, max_passes=0, alias=False, alternate=False):
    """Host-driven sweep loop, software-pipelined against the tunnel.

    Each iteration speculatively dispatches the next sweep *before*
    fetching the previous sweep's convergence scalar, so the ~15-20 ms
    device round-trip rides under real kernel time instead of serialising
    the sweeps.  The one speculative sweep dispatched after convergence
    runs with all-zero flags (pure block copy-through, ~1 ms).

    args:
        init_active: optional (gx, gy) bool of blocks that can produce a
            change in sweep 1 (flood seeding: only blocks with a maximum
            in their 3x3 neighbourhood); default all can_change blocks.
        progress: optional callback(sweep_index, active_block_count).
        alias: in-place sweeps (payload donated; Gauss-Seidel halo reads).
        alternate: flip the tile iteration direction every sweep so
            against-the-grid-order fronts also collapse quickly.
    """
    can_change = _block_can_change(best_k, bx, by)
    active0 = can_change if init_active is None else (
        init_active & can_change)
    flags = active0.reshape(-1).astype(jnp.int32)
    if not bool(jnp.any(flags)):
        return a
    sweep_fn = chase_sweep_inplace if alias else chase_sweep
    a, done = sweep_fn(a, best_k, flags, bx, by, h, max_passes, alias,
                       False)
    for s in range(max_sweeps):
        flags, any_active = _next_flags(done, can_change)
        rev = alternate and (s % 2 == 0)
        a2, done2 = sweep_fn(a, best_k, flags, bx, by, h,
                             max_passes, alias, rev)  # speculative
        if progress is not None:
            progress(s, int(jnp.sum(done[::8, ::128] > 0)))
        if not bool(any_active):
            # the speculative sweep was all copy-through: a2 == a
            return a2
        a, done = a2, done2
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


def _configs_for(shape, block_target=16, halo=8):
    """Measured-on-v5e config ladder: fine blocks win at <=384^3 (skip-flag
    granularity), bigger blocks at 512^3 (halo redundancy dominates)."""
    nx, ny, nz = shape
    if nx * ny * nz >= 512 ** 3:
        return ((64, 32, 8), (32, 32, 8), (16, 16, 8), (16, 8, 8),
                (8, 8, 8))
    return ((block_target, block_target, halo), (16, 8, 8), (8, 8, 8))


def resolve_roots_pallas(parent, best_k, max_sweeps: int = 4096,
                         block_target: int = 16, halo: int = 8,
                         progress=None):
    """Resolve ascent pointers to roots using the Pallas chase kernel.

    args:
        parent: (nx,ny,nz) int32 one-step ascent pointers (flat indices).
        best_k: (nx,ny,nz) uint8 step codes in OFFSETS order (13 == self).
    returns:
        (nx,ny,nz) int32 roots.
    """
    # trace under 32-bit mode: the kernel is all-explicit 32-bit, and x64
    # tracing leaks i64 scalars Mosaic cannot legalize
    with jax.enable_x64(False):
        return _try_configs(
            _configs_for(parent.shape, block_target, halo), parent.shape,
            lambda bx, by, h: _run_chase(parent, best_k, bx, by, h,
                                         max_sweeps, progress=progress),
        )


@partial(jax.jit, static_argnames=("has_vacuum",))
def _flood_seed(best_k, vacuum, has_vacuum):
    """Flood-seed values: 0 unlabeled, k in [1..M] basin k-1, M+1 vacuum.

    Labels are 1-based ranks of the maxima in ascending flat-index order
    (blocked cumsum), so the decoded labels match the pointer-doubling
    reference ordering exactly (tpu_tests/test_tpu_kernels.py).
    """
    from pybader_tpu.ops.reductions import cumsum_blocked

    shape = best_k.shape
    is_self = best_k == jnp.uint8(13)
    is_max = (is_self & ~vacuum) if has_vacuum else is_self
    flat_max = is_max.reshape(-1)
    ranks = cumsum_blocked(flat_max.astype(jnp.int32)).reshape(shape)
    n_maxima = jnp.sum(flat_max.astype(jnp.int32))
    seed = jnp.where(is_max, ranks, jnp.int32(0))
    if has_vacuum:
        seed = jnp.where(vacuum, n_maxima + jnp.int32(1), seed)
    return seed, is_max, n_maxima


@jax.jit
def _flood_decode(out, n_max_dev):
    """Flooded values -> final labels (0-based, vacuum -1)."""
    labels = out - jnp.int32(1)
    return jnp.where(labels == n_max_dev, jnp.int32(-1), labels)


def labels_oneshot(best_k, vacuum=None, progress=None, block_target=16,
                   max_passes=0, alias=False, alternate=False):
    """Dense basin labels in ONE chase: seed maxima, flood downhill.

    The chase kernel moves *values* along the static bk-coded parent
    edges; seeding each maximum with its 1-based label and every other
    voxel with 0 converges every voxel to its root's label (each voxel's
    chain reaches exactly one root, so the first non-zero value delivered
    is correct; values change at most once, making stale halos safe).
    Compared to the earlier pointer-composition seeding, unlabeled regions
    cost one no-op pass instead of dozens of composition passes, and the
    initial active set shrinks to the blocks neighbouring a maximum.

    Labels are numbered by maximum flat index (ascending).  Vacuum voxels
    (self-step) carry sentinel M+1 through the flood and come back as -1.

    returns (labels int32 grid, n_maxima int).
    """
    shape = best_k.shape
    with jax.enable_x64(False):
        has_vac = vacuum is not None
        # best_k doubles as an (unused, DCE'd) dummy when there is no vacuum
        seed, is_max, n_max_dev = _flood_seed(
            best_k, vacuum if has_vac else best_k, has_vac,
        )

        def run(bx, by, h):
            init = _dilate_blocks(_block_any(is_max, bx, by))
            return _run_chase(seed, best_k, bx, by, h, 4096,
                              init_active=init, progress=progress,
                              max_passes=max_passes, alias=alias,
                              alternate=alternate)

        out = _try_configs(_configs_for(shape, block_target), shape, run)
        labels = _flood_decode(out, n_max_dev)
        # fetch the count only now: the transfer overlapped the sweeps
        n_maxima = int(n_max_dev)
    return labels, n_maxima
