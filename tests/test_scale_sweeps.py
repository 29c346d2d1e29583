"""Randomised oracle parity at 48^3 / 64^3 (VERDICT round-1 item 5).

The toy 16x14x12 goldens exercise every code path but not scale effects
(deep pointer chains, many basins, tie clusters on plateaus).  These sweeps
compare the full partition pipeline against the vectorised oracle (itself
asserted equal to the serial spec in test_oracle_equiv.py) on randomised
gaussian mixtures, vacuum on and off.
"""
import numpy as np
import pytest

from tests.oracle import gaussian_density, ongrid_oracle_fast

from pybader_tpu import grid as g
from pybader_tpu import pipeline


def _random_density(shape, seed, n_centers=8):
    rng = np.random.default_rng(seed)
    lat = np.diag(rng.uniform(6.0, 12.0, 3))
    centers = rng.uniform(0, 1, (n_centers, 3))
    widths = rng.uniform(0.35, 1.0, n_centers)
    amps = rng.uniform(0.5, 3.0, n_centers)
    rho = gaussian_density(shape, lat, centers, widths, amps) + 1e-9
    return rho, lat


def _check(shape, seed, vacuum: bool):
    rho, lat = _random_density(shape, seed)
    w = tuple(g.distance_weights(lat, shape))
    vac = (rho <= 5e-3 * rho.max()) if vacuum else None
    labels, maxima = pipeline.partition_ongrid(rho, vac, w)
    lab_o, mx_o = ongrid_oracle_fast(rho, w, vacuum=vac)
    np.testing.assert_array_equal(np.asarray(labels), lab_o)
    assert [tuple(m) for m in np.asarray(maxima)] == mx_o


@pytest.mark.parametrize("seed", range(10))
def test_ongrid_48cube_novac(seed):
    _check((48, 48, 48), seed, vacuum=False)


@pytest.mark.parametrize("seed", range(10, 20))
def test_ongrid_48cube_vac(seed):
    _check((48, 48, 48), seed, vacuum=True)


@pytest.mark.parametrize("seed", [100, 101, 102])
def test_ongrid_64cube(seed):
    _check((64, 64, 64), seed, vacuum=(seed % 2 == 0))


@pytest.mark.parametrize("seed", [7, 8])
def test_ongrid_nonuniform_shape(seed):
    _check((48, 40, 56), seed, vacuum=(seed % 2 == 0))
