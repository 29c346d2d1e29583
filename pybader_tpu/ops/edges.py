"""Edge detection stencils.

TPU-native equivalents of reference refinement.py:325-405 (edge_find) and
:408-508 (edge_check): one fused 26-neighbour stencil pass instead of a
serial scan with in-place neighbour marking.  The serial reference's marking
order turns out not to affect the final ``known`` state (any non-edge voxel
adjacent to an edge ends at -1 regardless of visit order), so the parallel
formulation is exact.

``known`` encoding (reference convention): 2 = interior or local max,
-1 = near an edge, -2 = edge voxel (to be refined), 0 = untouched (vacuum
far from any edge).

Deviation from the reference (documented, deliberate): the reference's
edge_check can classify *vacuum* voxels as edges (refinement.py:448 reads
volumes[pe] == -1 without skipping), which would let refinement re-assign
vacuum voxels to basins in 'changed' mode only — inconsistent with both
edge_find and 'all' mode.  We skip vacuum voxels as edge candidates in both.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pybader_tpu.grid import OFFSETS, SELF_INDEX


def _roll(a, off):
    return jnp.roll(a, shift=(-off[0], -off[1], -off[2]), axis=(0, 1, 2))


# the 26 non-self offsets, negated for the roll convention above
_NEIGH = np.array(
    [[-o[0], -o[1], -o[2]] for k, o in enumerate(OFFSETS)
     if k != SELF_INDEX], dtype=np.int32)


def _edge_and_max(reference, labels, is_max=None):
    """is_edge / is_max per voxel, vacuum neighbours ignored in both.

    ``is_max`` can be supplied precomputed: a voxel is a local max iff no
    neighbour has strictly higher density, which is exactly the self step
    of the ascent stencil (``bk == 13``, weights are positive so the
    weighted candidate exceeds the centre iff the raw density does) —
    passing it skips 26 rolls of the f64 density grid.  Vacuum neighbours
    can never be the higher one (vacuum is the low set), so the stencil's
    is_max agrees with the vacuum-ignoring definition.

    The 26-neighbour reductions run under lax.fori_loop with traced-shift
    rolls: an unrolled formulation lets XLA materialise several full-grid
    rolled copies at once and OOMs HBM at 512^3 (26 x 537 MB int32).
    """
    offs = jnp.asarray(_NEIGH)

    def body(k, carry):
        is_edge, not_max = carry
        o = offs[k]
        lab_n = jnp.roll(labels, shift=(o[0], o[1], o[2]), axis=(0, 1, 2))
        nonvac_n = lab_n != -1
        is_edge = is_edge | (nonvac_n & (lab_n != labels))
        if not_max is not None:
            rho_n = jnp.roll(reference, shift=(o[0], o[1], o[2]),
                             axis=(0, 1, 2))
            not_max = not_max | (nonvac_n & (rho_n > reference))
        return is_edge, not_max

    zero = jnp.zeros(labels.shape, dtype=bool)
    if is_max is not None:
        is_edge, _ = jax.lax.fori_loop(0, 26, lambda k, c: (
            body(k, (c[0], None))[0], c[1]), (zero, zero))
        return is_edge, is_max
    is_edge, not_max = jax.lax.fori_loop(0, 26, body, (zero, zero))
    return is_edge, ~not_max


def _dilate26(mask):
    offs = jnp.asarray(_NEIGH)

    def body(k, out):
        o = offs[k]
        return out | jnp.roll(mask, shift=(o[0], o[1], o[2]),
                              axis=(0, 1, 2))

    return jax.lax.fori_loop(0, 26, body, jnp.zeros(mask.shape, dtype=bool))


@jax.jit
def edge_find(reference: jax.Array, labels: jax.Array,
              is_max: jax.Array | None = None) -> jax.Array:
    """Full-grid edge scan -> known int8 grid (see module docstring)."""
    nonvac = labels != -1
    is_edge, is_max = _edge_and_max(reference, labels, is_max)
    edge = nonvac & is_edge & ~is_max
    near = _dilate26(edge) & ~edge
    known = jnp.where(
        edge, jnp.int8(-2),
        jnp.where(near, jnp.int8(-1),
                  jnp.where(nonvac, jnp.int8(2), jnp.int8(0))),
    )
    return known


@partial(jax.jit, static_argnames=("shape",))
def neighbors27_flat(idx: jax.Array, shape) -> jax.Array:
    """(K,) flat voxel indices -> (K*27,) flat indices of their periodic
    27-neighbourhoods (self included).  Padding entries (idx < 0) produce
    -1 across their whole row."""
    nx, ny, nz = shape
    valid = idx >= 0
    p = jnp.clip(idx, 0)
    x = p // (ny * nz)
    y = (p // nz) % ny
    z = p % nz
    offs = jnp.asarray(np.asarray(OFFSETS, dtype=np.int32))  # (27, 3)
    xn = jnp.remainder(x[:, None] + offs[None, :, 0], nx)
    yn = jnp.remainder(y[:, None] + offs[None, :, 1], ny)
    zn = jnp.remainder(z[:, None] + offs[None, :, 2], nz)
    flat = (xn * ny + yn) * nz + zn
    return jnp.where(valid[:, None], flat, -1).reshape(-1)


@partial(jax.jit, static_argnames=())
def filter_edges_sorted(cand: jax.Array, known_flat: jax.Array):
    """Unique candidate indices with known == -2, ascending, -1-padded.

    ``cand`` is a small (K*27,) index list (next iteration's edge set is a
    subset of the changed set's neighbourhoods), so the dedupe sort runs on
    K*27 elements instead of a full-grid compaction sort.
    returns (starts (K*27,) int32 ascending with -1 tail, count).
    """
    n = known_flat.shape[0]
    big = jnp.int32(np.iinfo(np.int32).max)
    k = jnp.take(known_flat, jnp.clip(cand, 0), mode="clip")
    keep = (cand >= 0) & (k == jnp.int8(-2))
    keys = jnp.where(keep, cand.astype(jnp.int32), big)
    s = jnp.sort(keys)
    uniq = s != jnp.concatenate([jnp.full((1,), -1, jnp.int32), s[:-1]])
    keys2 = jnp.where(uniq & (s != big), s, big)
    out = jnp.sort(keys2)
    count = jnp.sum(out != big)
    return jnp.where(out == big, jnp.int32(-1), out), count


@jax.jit
def edge_check(known: jax.Array, reference: jax.Array,
               labels: jax.Array,
               is_max: jax.Array | None = None) -> jax.Array:
    """Re-scan only the 27-neighbourhoods of changed edges (known == -2).

    Returns the updated known grid; the new edge set is ``known == -2``.
    """
    nonvac = labels != -1
    changed = known == -2
    cand = (changed | _dilate26(changed)) & nonvac
    is_edge, is_max = _edge_and_max(reference, labels, is_max)
    new_edge = cand & is_edge & ~is_max
    not_edge = cand & ~is_edge
    out = jnp.where(not_edge, jnp.int8(-1), known)
    out = jnp.where(new_edge, jnp.int8(-2), out)
    near_new = _dilate26(new_edge) & (out >= 0)
    out = jnp.where(near_new, jnp.int8(-1), out)
    return out
