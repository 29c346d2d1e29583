"""Default-config parity vs the reference algorithm's exact semantics.

The oracle implements the reference's order-dependent initial neargrid
(methods.py:222-611, threads=1) and its refinement re-walk protocol
(refinement.py:16-322, thread_handlers.py:128-236) clean-room; these tests
pin the repo's order-free pipeline to that spec at the acceptance config
refine_mode=('changed', 2) — the round-1 verdict's missing validation.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.oracle import (
    charge_sums, neargrid_oracle, ongrid_oracle, refine_oracle,
)
from tests.test_ongrid import LATTICE, SHAPE, make_density

from pybader_tpu import grid as g
from pybader_tpu import pipeline


def _setup(seed):
    rho = make_density(seed)
    w = g.distance_weights(LATTICE, SHAPE)
    tg = g.t_grad(LATTICE, SHAPE)
    return rho, w, tg


@pytest.mark.parametrize("mode,iters", [
    ("changed", 2), ("all", 2), ("changed", -1), ("all", 1),
])
def test_refinement_matches_reference_semantics(mode, iters):
    for seed in (0, 1, 4):
        rho, w, tg = _setup(seed)
        lab0, _ = pipeline.partition_ongrid(rho, None, tuple(w))
        lab0 = np.asarray(lab0)
        lab_o, ch_o = refine_oracle(rho, w, tg, lab0, mode, iters)
        lab_r, ch_r = pipeline.refine_labels(
            "neargrid", (mode, iters), rho, jnp.asarray(lab0), tuple(w),
            tg, verbose=False,
        )
        np.testing.assert_array_equal(np.asarray(lab_r), lab_o)
        assert ch_r == ch_o


def test_refinement_matches_reference_semantics_vacuum():
    """Parity with vacuum under the documented edge_check deviation.

    The reference's edge_check lets 'changed'-mode refinement reassign
    vacuum voxels to basins (refinement.py:448 has no vacuum skip); the
    pipeline deliberately fixes that (ops/edges.py docstring).  Parity is
    asserted against the oracle with the same fix applied, and the quirk's
    existence is pinned so the deviation stays documented, not accidental.
    """
    rho, w, tg = _setup(2)
    vac = rho <= np.quantile(rho, 0.25)
    lab0, _ = pipeline.partition_ongrid(rho, vac, tuple(w))
    lab0 = np.asarray(lab0)
    lab_o, ch_o = refine_oracle(rho, w, tg, lab0, "changed", 2,
                                skip_vacuum_edges=True)
    lab_r, ch_r = pipeline.refine_labels(
        "neargrid", ("changed", 2), rho, jnp.asarray(lab0), tuple(w), tg,
        verbose=False,
    )
    np.testing.assert_array_equal(np.asarray(lab_r), lab_o)
    assert ch_r == ch_o
    # the reference-exact oracle exhibits the quirk on this density:
    # vacuum voxels get reassigned to basins in 'changed' mode
    lab_q, _ = refine_oracle(rho, w, tg, lab0, "changed", 2)
    reassigned = (lab0 == -1) & (lab_q != -1)
    assert reassigned.any()
    # ... and the quirk cannot occur in 'all' mode (shared edge_find skips
    # vacuum), so the fix only changes where the reference is inconsistent
    lab_a, _ = refine_oracle(rho, w, tg, lab0, "all", 2)
    assert not ((lab0 == -1) & (lab_a != -1)).any()


def _default_chain_charges(rho, w, tg, full_trajectories):
    """Repo default pipeline: neargrid partition + ('changed', 2) refine."""
    lab, mx = pipeline.partition_neargrid(
        rho, None, tuple(w), tg, full_trajectories=full_trajectories,
    )
    lab, _ = pipeline.refine_labels(
        "neargrid", ("changed", 2), rho, lab, tuple(w), tg, verbose=False,
    )
    return np.asarray(lab), np.asarray(mx)


@pytest.mark.parametrize("seed", [0, 1, 2, 5])
def test_default_config_matches_reference_chain(seed):
    """Full-trajectory neargrid + ('changed',2) == reference default.

    The reference default is the order-dependent neargrid scan followed by
    ('changed', 2) refinement; the repo's order-free walk must land on the
    same labels (it starts at the state the reference refines towards).
    """
    rho, w, tg = _setup(seed)
    lab_o, mx_o = neargrid_oracle(rho, w, tg)
    lab_o, _ = refine_oracle(rho, w, tg, lab_o, "changed", 2)
    lab_r, mx_r = _default_chain_charges(rho, w, tg, True)
    vv = g.voxel_volume(LATTICE, SHAPE)
    c_o, _ = charge_sums(rho, lab_o, vv, len(mx_o))
    c_r, _ = charge_sums(rho, lab_r, vv, len(mx_r))
    by_max_o = {tuple(m): c_o[k] for k, m in enumerate(mx_o)}
    by_max_r = {tuple(map(int, m)): c_r[k] for k, m in enumerate(mx_r)}
    assert set(by_max_o) == set(by_max_r)
    for m, q in by_max_o.items():
        assert abs(q - by_max_r[m]) < 1e-9, (m, q, by_max_r[m])


@pytest.mark.parametrize("vacuum", [False, True])
def test_hybrid_switch_preserves_default_charges(vacuum):
    """The >16M-voxel hybrid substitution must not move ('changed', 2)
    charges (VERDICT round-1, item 5's 'done' criterion)."""
    rho, w, tg = _setup(3)
    vac = (rho <= np.quantile(rho, 0.25)) if vacuum else None
    lab_o, mx_o = neargrid_oracle(rho, w, tg, vacuum=vac)
    lab_o, _ = refine_oracle(rho, w, tg, lab_o, "changed", 2)
    lab_h, mx_h = pipeline.partition_neargrid(
        rho, vac, tuple(w), tg, full_trajectories=False,
    )
    lab_h, _ = pipeline.refine_labels(
        "neargrid", ("changed", 2), rho, lab_h, tuple(w), tg, verbose=False,
    )
    lab_h = np.asarray(lab_h)
    vv = g.voxel_volume(LATTICE, SHAPE)
    c_o, _ = charge_sums(rho, lab_o, vv, len(mx_o))
    c_h, _ = charge_sums(rho, lab_h, vv, len(mx_h))
    by_max_o = {tuple(m): c_o[k] for k, m in enumerate(mx_o)}
    by_max_h = {tuple(map(int, m)): c_h[k]
                for k, m in enumerate(np.asarray(mx_h))}
    assert set(by_max_o) == set(by_max_h)
    for m, q in by_max_o.items():
        assert abs(q - by_max_h[m]) < 1e-6, (m, q, by_max_h[m])


def test_neargrid_oracle_covers_grid():
    rho, w, tg = _setup(6)
    labels, maxima = neargrid_oracle(rho, w, tg)
    assert (labels >= 0).all()
    assert labels.max() == len(maxima) - 1
    # every maximum is an ongrid maximum labelled with its own basin
    lab_on, _ = ongrid_oracle(rho, w)
    for k, m in enumerate(maxima):
        assert labels[m] == k
