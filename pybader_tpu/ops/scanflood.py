"""Directional-scan label flooding: long-chain basin labelling in O(bends).

The block-halo chase kernel (ops/pallas_chase.py) propagates labels one
ascent step per pass, so a chain of length L costs ~L full-block passes —
fine for compact basins, catastrophic for smooth interstitial regions
whose gradient-flow chains span hundreds of voxels (measured 3.6 s at
384^3 on a dense bulk-solid-like field, 26 sweeps of ~550 active blocks).

This module floods labels with *plane scans* instead: a +x scan processes
x-planes in ascending order, each voxel adopting its parent's label where
the parent lies in the just-updated previous plane (Gauss-Seidel at voxel
granularity).  A single scan therefore propagates a label along every
chain segment whose x-steps are monotone decreasing — the whole segment
in ONE grid traversal.  Six scans (+-x, +-y, +-z) advance every possible
link direction; chains need one extra round per direction *bend*, and
gradient-flow paths in smooth densities bend a handful of times.  Each
scan is one lax.scan over planes (fully on-device, no Pallas, any grid
shape), so the total cost is (number of bends) x (a few full-grid
passes).

Correctness: identical to the flood semantics of
:func:`pybader_tpu.ops.pallas_chase.labels_oneshot` — a voxel's value
changes at most once, from 0 to its root's label (each voxel's ascent
chain reaches exactly one root, so the first label delivered along the
chain is correct; scan order only affects *when*, never *what*).
Periodic wrap across the scan axis is handled by seeding the carry with
the opposite boundary plane of the previous state (one extra round of
latency for chains that cross the boundary).

Replaces: serial path-following with early exit in the reference
(/root/reference/pybader/methods.py:15-219) — this is the TPU-native
equivalent of its path-compression work efficiency.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("axis",))
def _axis_codes(bk, axis: int):
    """Split step codes into (scan-axis component, in-plane code).

    component: 0/1/2 for parent offset -1/0/+1 along ``axis``;
    in-plane code: (c_a1 * 3 + c_a2) over the remaining two axes in
    ascending axis order — matching the roll order used by the scans.
    """
    cx = bk // 9
    cy = (bk // 3) % 3
    cz = bk % 9 % 3
    comps = (cx, cy, cz)
    a1, a2 = (a for a in range(3) if a != axis)
    return comps[axis], comps[a1] * jnp.uint8(3) + comps[a2]


def _adopt(own, cand):
    return jnp.where((own == 0) & (cand > 0), cand, own)


def _sel9(src, inplane):
    """Parent value for in-plane offsets: src[y+dy, z+dz] per code."""
    out = src  # code 4: dy = dz = 0
    for code in range(9):
        dy, dz = code // 3 - 1, code % 3 - 1
        if dy == 0 and dz == 0:
            continue
        rolled = jnp.roll(src, (-dy, -dz), (0, 1))
        out = jnp.where(inplane == jnp.uint8(code), rolled, out)
    return out


@partial(jax.jit, static_argnames=("axis", "reverse", "ppstep"),
         donate_argnums=(0,))
def scan_flood_dir(labels, comp, inplane, axis: int, reverse: bool,
                   ppstep: int = 1):
    """One directional flood scan along ``axis``.

    args:
        labels: int32 grid (0 = unlabeled; donated).
        comp / inplane: outputs of :func:`_axis_codes` for this axis.
        ppstep: planes processed per scan step (must divide the axis
            length).  Within a step the planes update sequentially, so
            the result is BIT-IDENTICAL to ppstep=1 — this is purely a
            latency knob: a lax.scan step costs ~45 us of fixed overhead
            on TPU, and at 384^3 the plane compute is far below that, so
            fewer/fatter steps cut a 111 ms scan round to 82 ms
            (measured, ppstep=8).
    returns the updated labels grid.
    """
    lm = jnp.moveaxis(labels, axis, 0)
    cm = jnp.moveaxis(comp, axis, 0)
    im = jnp.moveaxis(inplane, axis, 0)
    # the plane "ahead" in scan direction, old values (for parents that
    # sit against the scan direction): in plane order, the next plane is
    # always un-updated when this one is processed, whatever the grouping
    ahead = jnp.roll(lm, 1 if reverse else -1, 0)
    npl = lm.shape[0]
    assert npl % ppstep == 0, (npl, ppstep)
    grp = lambda a: a.reshape(  # noqa: E731
        (npl // ppstep, ppstep) + a.shape[1:])
    # the parent component on the just-updated side of the scan
    upd = jnp.uint8(2) if reverse else jnp.uint8(0)

    def step(carry, xs):
        own, ahead_old, c, ip = xs
        behind = carry  # just-updated previous plane (scan direction)
        outs = [None] * ppstep
        order = range(ppstep - 1, -1, -1) if reverse else range(ppstep)
        for j in order:
            # descending scan: parent offset +1 is the updated side
            cand = jnp.where(
                c[j] == upd, _sel9(behind, ip[j]),
                jnp.where(c[j] == jnp.uint8(1), _sel9(own[j], ip[j]),
                          _sel9(ahead_old[j], ip[j])))
            new = _adopt(own[j], cand)
            outs[j] = new
            behind = new
        return behind, jnp.stack(outs)

    init = lm[0] if reverse else lm[-1]  # periodic wrap, previous state
    _, planes = jax.lax.scan(step, init,
                             (grp(lm), grp(ahead), grp(cm), grp(im)),
                             reverse=reverse)
    return jnp.moveaxis(planes.reshape(lm.shape), 0, axis)


@jax.jit
def _n_unlabeled(labels):
    return jnp.sum((labels == 0).astype(jnp.int32))


def _ppstep_for(n: int) -> int:
    """Planes-per-step choice: the largest supported divisor of ``n``.

    ppstep > 1 only pays on TPU (scan-step dispatch overhead); on CPU the
    8x-unrolled plane body just multiplies compile time for the test
    grids, so the host backend stays at 1.
    """
    if jax.default_backend() == "cpu":
        return 1
    for p in (8, 4, 2):
        if n % p == 0:
            return p
    return 1


@partial(jax.jit, donate_argnums=(0,))
def _round_pallas(lab, c0, i0, c1, i1, c2, i2):
    """One full flood round (6 Pallas scans + transposes + count) as a
    SINGLE program: dispatched eagerly, a round was ~13 op dispatches
    through the remote-device tunnel at ~4 ms each — the kernels
    themselves are ~2 ms.  The unlabeled count rides along so the
    convergence check costs one scalar fetch, not a dispatch.
    """
    from pybader_tpu.ops import pallas_flood

    cms, ims = (c0, c1, c2), (i0, i1, i2)
    for axis in range(3):
        lm = jnp.moveaxis(lab, axis, 0)
        lm = pallas_flood._scan_call(lm, cms[axis], ims[axis], False)
        lm = pallas_flood._scan_call(lm, cms[axis], ims[axis], True)
        lab = jnp.moveaxis(lm, 0, axis)
    return lab, jnp.sum((lab == 0).astype(jnp.int32))


@partial(jax.jit, donate_argnums=(0,), static_argnames=("pps",))
def _round_xla(lab, codes0, codes1, codes2, pps):
    for axis, (comp, inplane) in enumerate((codes0, codes1, codes2)):
        lab = scan_flood_dir(lab, comp, inplane, axis, False, pps[axis])
        lab = scan_flood_dir(lab, comp, inplane, axis, True, pps[axis])
    return lab, jnp.sum((lab == 0).astype(jnp.int32))


def _make_round(shape, codes, force_xla: bool = False):
    """Build the one-round scan function: Pallas backend when the grid
    tiles, XLA grouped-plane scans otherwise.

    The Pallas scan (ops/pallas_flood.py) keeps the Gauss-Seidel carry in
    VMEM across a sequential grid — HBM sees one read and one write of
    the label planes per scan vs ~16 MB of rolled-copy traffic per plane
    in the XLA formulation.  Both directions along an axis run in the
    moved-axis layout, so each axis costs one transpose pair per round;
    the per-axis step codes are transposed once up front.  Either way the
    whole round is one jitted program returning (labels, n_unlabeled).
    """
    from pybader_tpu.ops import pallas_disabled

    use_pallas = (jax.default_backend() != "cpu" and not force_xla
                  and not pallas_disabled("flood"))
    if use_pallas:
        from pybader_tpu.ops import pallas_flood

        use_pallas = pallas_flood.supports_shape(shape)
    if use_pallas:
        cms = [jnp.moveaxis(codes[a][0], a, 0) for a in range(3)]
        ims = [jnp.moveaxis(codes[a][1], a, 0) for a in range(3)]

        def one_round(lab):
            return _round_pallas(lab, cms[0], ims[0], cms[1], ims[1],
                                 cms[2], ims[2])

        return one_round
    pps = tuple(_ppstep_for(shape[axis]) for axis in range(3))

    def one_round(lab):
        return _round_xla(lab, codes[0], codes[1], codes[2], pps)

    return one_round


def flood_rounds(labels, bk, max_rounds: int = 64, progress=None):
    """Alternating-direction scan rounds until every voxel is labeled.

    One round = scans along +x, -x, +y, -y, +z, -z.  The unlabeled count
    strictly decreases while any remains (every chain's labeled frontier
    has a link some direction advances), so termination is guaranteed;
    smooth densities converge in a few rounds.

    The convergence fetch is software-pipelined: round r+1 is dispatched
    before round r's unlabeled count is read on the host, so the device
    round-trip rides under real scan time (the one speculative round after
    convergence adopts nothing; its result is returned unchanged).
    """
    codes = [_axis_codes(bk, axis) for axis in range(3)]
    one_round = _make_round(labels.shape, codes)
    # once the unlabeled count drops below this, check convergence with a
    # blocking scalar fetch instead of speculatively dispatching another
    # round: the tail of the decay is steep (18K -> 0 at a dense 384^3),
    # and a wasted round costs ~54 ms vs ~10 ms for the fetch RTT
    small_thresh = max(65536, labels.size // 512)

    prev_cnt = None
    left = -1  # unlabeled count from the most recently FETCHED round
    for r in range(max_rounds):
        if prev_cnt is not None and 0 <= left <= small_thresh:
            left = int(prev_cnt)  # blocking convergence check
            if progress is not None:
                progress(r - 1, left)
            if left == 0:
                return labels
        if r == 0:
            try:
                from jax._src.pallas.mosaic.error_handling import (
                    MosaicError,
                )
            except ImportError:  # pallas internals moved; rely on runtime
                MosaicError = RuntimeError  # noqa: N806
            try:
                labels, cnt = one_round(labels)
            except (RuntimeError, MosaicError) as e:  # compile/launch fail
                import warnings

                warnings.warn(
                    f"pallas flood scan unavailable ({e}); falling back "
                    f"to XLA plane scans")
                one_round = _make_round(labels.shape, codes,
                                        force_xla=True)
                labels, cnt = one_round(labels)
        else:
            labels, cnt = one_round(labels)
        if prev_cnt is not None and not (0 <= left <= small_thresh):
            left = int(prev_cnt)  # overlaps the round just dispatched
            if progress is not None:
                progress(r - 1, left)
            if left == 0:
                return labels  # that round was the no-op speculation
        prev_cnt = cnt
    left = int(prev_cnt)
    if progress is not None:
        progress(max_rounds - 1, left)
    if left == 0:
        return labels
    raise RuntimeError(
        f"scan flood did not converge in {max_rounds} rounds "
        f"({left} voxels unlabeled) — is the pointer graph acyclic?")


def labels_scanflood(best_k, vacuum=None, progress=None):
    """Dense basin labels by directional-scan flooding.

    Same contract as :func:`pybader_tpu.ops.pallas_chase.labels_oneshot`:
    labels numbered by maximum flat index (ascending), vacuum -1.
    Shape-agnostic (no kernel tiling constraints).

    returns (labels int32 grid, n_maxima int).
    """
    from pybader_tpu.ops.pallas_chase import _flood_decode, _flood_seed

    with jax.enable_x64(False):
        has_vac = vacuum is not None
        seed, _is_max, n_max_dev = _flood_seed(
            best_k, vacuum if has_vac else best_k, has_vac)
        out = flood_rounds(seed, best_k, progress=progress)
        labels = _flood_decode(out, n_max_dev)
        n_maxima = int(n_max_dev)
    return labels, n_maxima


@jax.jit
def _root_seed(best_k):
    """Seed for root resolution: every self-step voxel (maxima AND vacuum)
    is its own root; flooding delivers root_flat+1 to its whole basin."""
    shape = best_k.shape
    nx, ny, nz = shape
    x = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    y = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    z = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    self_idx = (x * ny + y) * nz + z
    is_self = best_k == jnp.uint8(13)
    return jnp.where(is_self, self_idx + jnp.int32(1), jnp.int32(0))


def resolve_roots_scan(best_k, progress=None):
    """Ascent-pointer roots via directional-scan flooding (any shape).

    Same result as :func:`pybader_tpu.ops.pointer.resolve_roots` on the
    decoded parents: (nx,ny,nz) int32 flat root indices.
    """
    with jax.enable_x64(False):
        seed = _root_seed(best_k)
        out = flood_rounds(seed, best_k, progress=progress)
        return out - jnp.int32(1)
