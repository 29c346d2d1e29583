"""Accuracy gate: the reference's own convergence harness as a test.

The reference defines correctness by convergence to the fully-refined state
(examples/compare_methods.py: ground truth = refine_mode=('all', -1); the
plotted metric is per-atom sum|dq| and max|dq| vs refinement iterations).
"""
import numpy as np
import jax.numpy as jnp

from tests.oracle import gaussian_density
from tests.test_io import ATOMS
from tests.test_ongrid import LATTICE, SHAPE

from pybader_tpu import grid as g
from pybader_tpu import pipeline
from pybader_tpu.ops import atoms as atoms_ops
from pybader_tpu.ops import reductions


def _density():
    centers = ATOMS @ np.linalg.inv(LATTICE)
    rho = gaussian_density(SHAPE, LATTICE, centers, [0.9, 0.8], [2.0, 1.5])
    return rho + 1e-8


def _atom_charges(rho, labels, maxima):
    """Per-atom charges for a given partition."""
    w_frac = g.voxel_to_fractional(maxima, SHAPE, np.zeros(3))
    max_cart = g.fractional_to_cartesian(w_frac, LATTICE)
    atom_idx, _ = atoms_ops.assign_to_atoms(
        jnp.asarray(max_cart), jnp.asarray(ATOMS), jnp.asarray(LATTICE)
    )
    swap = jnp.asarray(np.asarray(atom_idx), dtype=jnp.int32)
    atom_labels = reductions.relabel(jnp.asarray(labels, dtype=jnp.int32), swap)
    vv = g.voxel_volume(LATTICE, SHAPE)
    charge, _ = reductions.charge_volume_sum(
        jnp.asarray(rho), atom_labels, vv, ATOMS.shape[0]
    )
    return np.asarray(charge)


def test_refinement_error_decreases_to_ground_truth():
    rho = _density()
    w = tuple(g.distance_weights(LATTICE, SHAPE))
    tg = g.t_grad(LATTICE, SHAPE)

    # ground truth: neargrid partition refined until nothing changes
    lab_gt, max_gt = pipeline.partition_neargrid(rho, None, w, tg)
    lab_gt, _ = pipeline.refine_labels(
        "neargrid", ("all", -1), rho, lab_gt, w, tg, verbose=False
    )
    q_gt = _atom_charges(rho, lab_gt, max_gt)

    errors = []
    for iters in (0, 1, -1):
        lab, maxima = pipeline.partition_ongrid(rho, None, w)
        if iters != 0:
            lab, _ = pipeline.refine_labels(
                "neargrid", ("changed", iters), rho, lab, w, tg,
                verbose=False,
            )
        q = _atom_charges(rho, lab, maxima)
        errors.append(np.abs(q - q_gt).max())

    # refinement moves ongrid towards the converged neargrid ground truth
    assert errors[1] <= errors[0]
    assert errors[2] <= errors[1]
    # converged 'changed' refinement lands on the ground truth
    assert errors[2] < 1e-6, errors


def test_charge_conservation_all_methods():
    rho = _density()
    w = tuple(g.distance_weights(LATTICE, SHAPE))
    tg = g.t_grad(LATTICE, SHAPE)
    vv = g.voxel_volume(LATTICE, SHAPE)
    total = rho.sum() * vv
    for labels, maxima in (
        pipeline.partition_ongrid(rho, None, w),
        pipeline.partition_neargrid(rho, None, w, tg),
        pipeline.partition_neargrid(rho, None, w, tg,
                                    full_trajectories=False),
    ):
        charge, _ = reductions.charge_volume_sum(
            jnp.asarray(rho), jnp.asarray(labels), vv, len(maxima)
        )
        np.testing.assert_allclose(
            float(np.asarray(charge).sum()), total, rtol=1e-12
        )
