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

import jax
import jax.numpy as jnp

from pybader_tpu.grid import OFFSETS, SELF_INDEX


def _roll(a, off):
    return jnp.roll(a, shift=(-off[0], -off[1], -off[2]), axis=(0, 1, 2))


def _edge_and_max(reference, labels):
    """is_edge / is_max per voxel, vacuum neighbours ignored in both."""
    is_edge = jnp.zeros(labels.shape, dtype=bool)
    not_max = jnp.zeros(labels.shape, dtype=bool)
    for k, off in enumerate(OFFSETS):
        if k == SELF_INDEX:
            continue
        lab_n = _roll(labels, off)
        rho_n = _roll(reference, off)
        nonvac_n = lab_n != -1
        is_edge |= nonvac_n & (lab_n != labels)
        not_max |= nonvac_n & (rho_n > reference)
    return is_edge, ~not_max


def _dilate26(mask):
    out = jnp.zeros(mask.shape, dtype=bool)
    for k, off in enumerate(OFFSETS):
        if k == SELF_INDEX:
            continue
        out |= _roll(mask, off)
    return out


@jax.jit
def edge_find(reference: jax.Array, labels: jax.Array) -> jax.Array:
    """Full-grid edge scan -> known int8 grid (see module docstring)."""
    nonvac = labels != -1
    is_edge, is_max = _edge_and_max(reference, labels)
    edge = nonvac & is_edge & ~is_max
    near = _dilate26(edge) & ~edge
    known = jnp.where(
        edge, jnp.int8(-2),
        jnp.where(near, jnp.int8(-1),
                  jnp.where(nonvac, jnp.int8(2), jnp.int8(0))),
    )
    return known


@jax.jit
def edge_check(known: jax.Array, reference: jax.Array,
               labels: jax.Array) -> jax.Array:
    """Re-scan only the 27-neighbourhoods of changed edges (known == -2).

    Returns the updated known grid; the new edge set is ``known == -2``.
    """
    nonvac = labels != -1
    changed = known == -2
    cand = (changed | _dilate26(changed)) & nonvac
    is_edge, is_max = _edge_and_max(reference, labels)
    new_edge = cand & is_edge & ~is_max
    not_edge = cand & ~is_edge
    out = jnp.where(not_edge, jnp.int8(-1), known)
    out = jnp.where(new_edge, jnp.int8(-2), out)
    near_new = _dilate26(new_edge) & (out >= 0)
    out = jnp.where(near_new, jnp.int8(-1), out)
    return out
