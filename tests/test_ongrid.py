"""Golden tests: ongrid partition vs the serial numpy oracle."""
import numpy as np
import pytest

from tests.oracle import gaussian_density, ongrid_oracle, charge_sums

from pybader_tpu import grid as g
from pybader_tpu import pipeline
from pybader_tpu.ops import reductions


LATTICE = np.array([
    [6.0, 0.0, 0.3],
    [0.2, 5.0, 0.0],
    [0.0, 0.1, 7.0],
])
SHAPE = (16, 14, 12)


def make_density(seed=0, n_blobs=4, shape=SHAPE, lattice=LATTICE):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0.1, 0.9, size=(n_blobs, 3))
    widths = rng.uniform(0.6, 1.2, size=n_blobs)
    amps = rng.uniform(0.5, 2.0, size=n_blobs)
    rho = gaussian_density(shape, lattice, centers, widths, amps)
    return rho + 1e-6  # small floor so nothing is exactly zero


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ongrid_labels_match_oracle(seed):
    rho = make_density(seed)
    w = g.distance_weights(LATTICE, SHAPE)
    labels, maxima = pipeline.partition_ongrid(rho, None, tuple(w))
    labels = np.asarray(labels)
    ref_labels, ref_maxima = ongrid_oracle(rho, w)
    assert len(maxima) == len(ref_maxima)
    np.testing.assert_array_equal(labels, ref_labels)
    np.testing.assert_array_equal(maxima, np.array(ref_maxima))


def test_ongrid_with_vacuum():
    rho = make_density(3)
    tol = np.quantile(rho, 0.3)
    vac = rho <= tol
    w = g.distance_weights(LATTICE, SHAPE)
    labels, maxima = pipeline.partition_ongrid(rho, vac, tuple(w))
    labels = np.asarray(labels)
    ref_labels, ref_maxima = ongrid_oracle(rho, w, vacuum=vac)
    np.testing.assert_array_equal(labels, ref_labels)
    assert len(maxima) == len(ref_maxima)
    assert (labels[vac] == -1).all()
    assert (labels[~vac] >= 0).all()


def test_charge_volume_sums():
    rho = make_density(4)
    w = g.distance_weights(LATTICE, SHAPE)
    vox_vol = g.voxel_volume(LATTICE, SHAPE)
    labels, maxima = pipeline.partition_ongrid(rho, None, tuple(w))
    m = len(maxima)
    charge, volume = reductions.charge_volume_sum(
        rho, np.asarray(labels), vox_vol, m
    )
    ref_c, ref_v = charge_sums(rho, np.asarray(labels), vox_vol, m)
    np.testing.assert_allclose(np.asarray(charge), ref_c, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(volume), ref_v, rtol=1e-12)
    # charge conservation
    np.testing.assert_allclose(
        np.asarray(charge).sum(), rho.sum() * vox_vol, rtol=1e-12
    )


def test_vacuum_mask_sums():
    rho = make_density(5)
    vox_vol = g.voxel_volume(LATTICE, SHAPE)
    tol = float(np.quantile(rho, 0.25))
    mask, vc, vv = reductions.vacuum_mask(rho, tol, rho, vox_vol)
    mask = np.asarray(mask)
    assert mask.sum() > 0
    np.testing.assert_allclose(float(vc), rho[mask].sum() * vox_vol, rtol=1e-12)
    np.testing.assert_allclose(float(vv), mask.sum() * vox_vol, rtol=1e-12)
