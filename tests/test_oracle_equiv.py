"""The fast vectorised oracle is exactly the serial oracle.

The serial oracle (path-following with adoption, discovery-order numbering)
is the independent spec; the fast oracle used for large randomised sweeps
rests on two claims — adoption assigns the root's label, and discovery order
is first-occurrence order of roots — which these tests assert empirically.
"""
import numpy as np

from tests.oracle import (
    gaussian_density, ongrid_oracle, ongrid_oracle_fast,
)
from tests.test_ongrid import LATTICE, SHAPE, make_density

from pybader_tpu import grid as g


def _assert_same(rho, w, vacuum=None):
    lab_s, mx_s = ongrid_oracle(rho, w, vacuum=vacuum)
    lab_f, mx_f = ongrid_oracle_fast(rho, w, vacuum=vacuum)
    np.testing.assert_array_equal(lab_s, lab_f)
    assert mx_s == mx_f


def test_fast_oracle_equals_serial_small():
    w = g.distance_weights(LATTICE, SHAPE)
    for seed in range(6):
        _assert_same(make_density(seed), w)


def test_fast_oracle_equals_serial_with_vacuum():
    w = g.distance_weights(LATTICE, SHAPE)
    for seed in range(3):
        rho = make_density(seed)
        vac = rho <= np.quantile(rho, 0.3)
        _assert_same(rho, w, vacuum=vac)


def test_fast_oracle_equals_serial_24cube():
    shape = (24, 24, 24)
    lat = np.diag([5.0, 5.5, 6.0])
    rng = np.random.default_rng(7)
    centers = rng.uniform(0, 1, (4, 3))
    rho = gaussian_density(
        shape, lat, centers, rng.uniform(0.4, 0.9, 4),
        rng.uniform(0.5, 2.0, 4),
    ) + 1e-9
    w = g.distance_weights(lat, shape)
    _assert_same(rho, w)
    vac = rho <= np.quantile(rho, 0.2)
    _assert_same(rho, w, vacuum=vac)
