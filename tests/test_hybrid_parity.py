"""Hybrid-vs-full-trajectory parity at scale (round-2 verdict item 7).

`partition_neargrid` substitutes ongrid + refine-to-convergence for the
per-voxel trajectory walk above 16M voxels (pipeline.py).  The two raw
passes can legitimately differ on interior voxels (the walker re-routes
some non-edge voxels the refinement never revisits), so the pinned
equivalence is at the REFERENCE'S OWN ground truth: refinement run to
convergence (examples/compare_methods.py:16 defines `refine_mode=
('all'|'changed', -1)` as truth).  Both initialisations must land on the
same converged charges to well under the 1e-6 e parity budget.

Randomized gaussian-mixture densities at 48^3 and 64^3, multiple seeds —
the scale the round-2 verdict flagged as untested (equivalence was pinned
only at <= 24x28x32).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.oracle import gaussian_density

from pybader_tpu import grid as g
from pybader_tpu import pipeline
from pybader_tpu.ops import reductions

LATTICE = np.diag([10.0, 11.0, 9.5])


def _density(shape, seed, n_blobs=6):
    rng = np.random.default_rng(seed)
    return gaussian_density(
        shape, LATTICE, rng.random((n_blobs, 3)),
        0.45 + 0.6 * rng.random(n_blobs), 1.0 + 2.0 * rng.random(n_blobs),
    )


def _converged_charges(rho, w, tg, full_trajectories):
    labels, maxima = pipeline.partition_neargrid(
        rho, None, w, tg, full_trajectories=full_trajectories)
    labels, _ = pipeline.refine_labels(
        "neargrid", ("changed", -1), rho, labels, w, tg, verbose=False)
    n = len(maxima)
    vox = g.voxel_volume(LATTICE, rho.shape)
    charge, _ = reductions.charge_volume_sum(
        jnp.asarray(rho), labels, vox, n)
    return np.sort(np.asarray(charge)), n


@pytest.mark.parametrize("seed", range(6))
def test_hybrid_matches_full_at_48(seed):
    shape = (48, 48, 48)
    rho = _density(shape, seed)
    w = tuple(g.distance_weights(LATTICE, shape))
    tg = g.t_grad(LATTICE, shape)
    q_full, n_full = _converged_charges(rho, w, tg, True)
    q_hyb, n_hyb = _converged_charges(rho, w, tg, False)
    assert n_full == n_hyb
    assert np.max(np.abs(q_full - q_hyb)) < 1e-6


@pytest.mark.parametrize("seed", (10, 11))
def test_hybrid_matches_full_at_64(seed):
    shape = (64, 64, 64)
    rho = _density(shape, seed, n_blobs=8)
    w = tuple(g.distance_weights(LATTICE, shape))
    tg = g.t_grad(LATTICE, shape)
    q_full, n_full = _converged_charges(rho, w, tg, True)
    q_hyb, n_hyb = _converged_charges(rho, w, tg, False)
    assert n_full == n_hyb
    assert np.max(np.abs(q_full - q_hyb)) < 1e-6
