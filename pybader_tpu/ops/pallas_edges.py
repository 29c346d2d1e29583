"""Pallas TPU kernels for the edge-detection stencils.

The XLA edge stencils (ops/edges.py) are separable 3x3x3 min/max/or
sweeps — correct and shape-agnostic, but each full-grid roll re-reads the
int32 label grid from HBM (edge_find ~12 label rolls + 6 mask rolls,
edge_check ~18: measured 60-180 ms per call at 384^3 against a ~1 ms
bandwidth floor).  These kernels compute the final ``known``
classification in ONE pass: the grid is cut into k-plane groups along
axis 0; each program reads its own group plus the neighbouring groups
(periodic wraparound via the BlockSpec index map), giving the 2-plane
halo the 5x5x5 dependency cone of near-edge classification needs, and
every intermediate plane (vacuum-sentineled window extrema, edge flags,
in-plane dilations) lives in VMEM.

Semantics are identical to :func:`pybader_tpu.ops.edges.edge_find` /
:func:`~pybader_tpu.ops.edges.edge_check` (pinned by interpret-mode CPU
tests and the on-device lane): reference refinement.py:325-405 and
:408-508, with the same documented vacuum deviation.

``is_max`` must be supplied (the ascent stencil's self-step mask) — the
callers on the hot path always have it; the density-derived fallback
stays on the XLA route.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(np.iinfo(np.int32).max)


def supports_shape(shape) -> bool:
    """Axis-0 cut into >=2-plane groups; (8,128) i32 / (32,128) i8 plane
    tiling (partial tiles under rolls pull padding into the window)."""
    npl, h, w = shape
    return (npl % 2 == 0 and npl >= 4
            and h % 32 == 0 and w % 128 == 0)


def _group_planes(npl: int, plane_bytes: int) -> int:
    """Planes per group, bounded so the ~12 live i32 planes per group
    plane (3 label blocks + window extrema + edge/dilation caches) stay
    well inside the 128 MB physical VMEM at 512^2-class plane sizes."""
    for k in (8, 4, 2):
        if npl % k == 0 and (k + 4) * plane_bytes * 12 <= 96 * 1024 * 1024:
            return k
    for k in (4, 2):
        if npl % k == 0:
            return k
    raise ValueError(npl)


def _roll2(p, dy: int, dz: int, h: int, w: int):
    out = p
    if dy:
        out = pltpu.roll(out, np.int32((-dy) % h), 0)
    if dz:
        out = pltpu.roll(out, np.int32((-dz) % w), 1)
    return out


def _win3(p_lo, p_mid, p_hi, combine):
    return combine(combine(p_lo, p_mid), p_hi)


def _inplane_box(p, combine, h: int, w: int):
    """Separable in-plane 3x3 window reduction (self included)."""
    t = _win3(_roll2(p, -1, 0, h, w), p, _roll2(p, 1, 0, h, w), combine)
    return _win3(_roll2(t, 0, -1, h, w), t, _roll2(t, 0, 1, h, w), combine)


def _inplane_box_or(mask, h: int, w: int):
    """In-plane 3x3 dilation of a bool plane -> bool.

    Mosaic's vector rotate only handles 32-bit lanes ("Rotate with
    non-32-bit data" on i1 vectors, v5e), so the dilation widens the mask
    to int32 before the rolls and narrows back after."""
    return _inplane_box(
        mask.astype(jnp.int32), jnp.bitwise_or, h, w) != 0


def _make_kernel(k: int, h: int, w: int, check: bool):
    def kernel(*refs):
        if check:
            (labP, labC, labN, mxP, mxC, mxN, knP, knC, knN,
             out_ref) = refs
        else:
            labP, labC, labN, mxP, mxC, mxN, out_ref = refs
            knP = knC = knN = None

        def plane(refP, refC, refN, j):
            if j < 0:
                return refP[k + j]
            if j >= k:
                return refN[j - k]
            return refC[j]

        # Mosaic (v5e) vectorises compares on 32-bit lanes only ("Target
        # does not support this comparison" on i8/u8 vectors), so every
        # sub-32-bit plane widens to int32 at load.
        lab = lambda j: plane(labP, labC, labN, j)  # noqa: E731
        mx = lambda j: (  # noqa: E731
            plane(mxP, mxC, mxN, j).astype(jnp.int32) != 0)

        # window extrema with vacuum sentinels, cached per needed plane
        xmax, xmin = {}, {}
        for j in range(-1, k + 1):
            planes = [lab(j - 1), lab(j), lab(j + 1)]
            smax = [jnp.where(p == -1, -_BIG, p) for p in planes]
            smin = [jnp.where(p == -1, _BIG, p) for p in planes]
            xmax[j] = _win3(*smax, jnp.maximum)
            xmin[j] = _win3(*smin, jnp.minimum)
        is_edge = {}
        for j in range(-1, k + 1):
            bmax = _inplane_box(xmax[j], jnp.maximum, h, w)
            bmin = _inplane_box(xmin[j], jnp.minimum, h, w)
            is_edge[j] = bmax != bmin

        if not check:
            # edge = nonvac & is_edge & ~is_max; near = dilate26(edge)
            ep, din = {}, {}
            for j in range(-1, k + 1):
                ep[j] = is_edge[j] & (lab(j) != -1) & (~mx(j))
                din[j] = _inplane_box_or(ep[j], h, w)
            for j in range(k):
                near = din[j - 1] | din[j] | din[j + 1]
                nonvac = lab(j) != -1
                out = jnp.where(
                    ep[j], jnp.int32(-2),
                    jnp.where(near & (~ep[j]), jnp.int32(-1),
                              jnp.where(nonvac, jnp.int32(2),
                                        jnp.int32(0))))
                out_ref[j] = out.astype(jnp.int8)
            return

        kn = lambda j: plane(knP, knC, knN, j).astype(jnp.int32)  # noqa: E731
        # cand = dilate26(known == -2) & nonvac, per plane in [-1, k]
        chg_in = {}
        for j in range(-2, k + 2):
            chg_in[j] = _inplane_box_or(kn(j) == -2, h, w)
        cand, newe, din = {}, {}, {}
        for j in range(-1, k + 1):
            c = (chg_in[j - 1] | chg_in[j] | chg_in[j + 1]) \
                & (lab(j) != -1)
            cand[j] = c
            newe[j] = c & is_edge[j] & (~mx(j))
            din[j] = _inplane_box_or(newe[j], h, w)
        for j in range(k):
            out = knC[j].astype(jnp.int32)
            out = jnp.where(cand[j] & (~is_edge[j]), jnp.int32(-1), out)
            out = jnp.where(newe[j], jnp.int32(-2), out)
            near_new = din[j - 1] | din[j] | din[j + 1]
            out = jnp.where(near_new & (out >= 0), jnp.int32(-1), out)
            out_ref[j] = out.astype(jnp.int8)

    return kernel


def _call(labels, is_max, known, check: bool, interpret: bool):
    npl, h, w = labels.shape
    k = _group_planes(npl, h * w * 4)
    nb = npl // k

    def cm(d):
        return lambda i: ((i + d) % nb, 0, 0)

    spec = lambda d: pl.BlockSpec((k, h, w), cm(d))  # noqa: E731
    ins = [labels.astype(jnp.int32)] * 3 + [is_max.astype(jnp.uint8)] * 3
    specs = [spec(-1), spec(0), spec(1)] * 2
    if check:
        ins += [known.astype(jnp.int8)] * 3
        specs += [spec(-1), spec(0), spec(1)]
    return pl.pallas_call(
        _make_kernel(k, h, w, check),
        grid=(nb,),
        in_specs=specs,
        out_specs=pl.BlockSpec((k, h, w), cm(0)),
        out_shape=jax.ShapeDtypeStruct((npl, h, w), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*ins)


@partial(jax.jit, static_argnames=("interpret",))
def edge_find(labels, is_max, interpret: bool = False):
    """known int8 grid — Pallas path of ops/edges.edge_find (is_max
    required)."""
    with jax.enable_x64(False):
        return _call(labels, is_max, None, False, interpret)


@partial(jax.jit, static_argnames=("interpret",))
def edge_check(known, labels, is_max, interpret: bool = False):
    """Updated known — Pallas path of ops/edges.edge_check."""
    with jax.enable_x64(False):
        return _call(labels, is_max, known, True, interpret)
