"""Interpret-mode validation of the Pallas per-label reduction kernels.

The kernels (ops/pallas_reduce.py) must agree with the XLA masked-sweep
implementations they replace on TPU (ops/reductions.py): exact for counts,
minima and remaps, and within the split-f32 error budget for charges.
Mosaic lowering itself is validated on device by the TPU lane
(tpu_tests/test_tpu_kernels.py); interpret mode checks the math and the
padding/blocking bookkeeping on any backend.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pybader_tpu.ops import pallas_reduce as pr
from pybader_tpu.ops import reductions as red


@pytest.mark.parametrize("n,k", [(13007, 23), (1 << 16, 8), (8191, 200)])
def test_charge_volume_matches_xla(n, k):
    rng = np.random.default_rng(n + k)
    lab = jnp.asarray(rng.integers(-1, k, size=n).astype(np.int32))
    rho = jnp.asarray(rng.uniform(0.1, 5.0, size=n))
    c, v = pr.charge_volume(rho, lab, 0.7, k, interpret=True)
    c0, v0 = red.charge_volume_sum(rho, lab, 0.7, k)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v0))


def test_charge_volume_empty_label():
    # labels that never occur must report exactly zero charge and volume
    lab = jnp.asarray(np.zeros(4096, np.int32))
    rho = jnp.asarray(np.ones(4096))
    c, v = pr.charge_volume(rho, lab, 1.0, 4, interpret=True)
    assert float(c[0]) == pytest.approx(4096.0)
    assert np.all(np.asarray(c[1:]) == 0.0)
    assert np.all(np.asarray(v[1:]) == 0.0)


@pytest.mark.parametrize("n,k", [(13007, 23), (40000, 61)])
def test_min_pair_matches_xla(n, k):
    rng = np.random.default_rng(n)
    lab = jnp.asarray(rng.integers(-1, k, size=n).astype(np.int32))
    mask = jnp.asarray(rng.random(n) < 0.01)
    iota = jnp.arange(n, dtype=jnp.int32)
    mn, mm = pr.min_pair(lab, mask, k, interpret=True)
    mn0, mm0 = red.masked_min_pair(iota, lab, mask, k)
    np.testing.assert_array_equal(np.asarray(mn), np.asarray(mn0))
    np.testing.assert_array_equal(np.asarray(mm), np.asarray(mm0))


def test_remap_matches_xla():
    rng = np.random.default_rng(7)
    n, k = 30000, 37
    lab = jnp.asarray(rng.integers(-1, k, size=n).astype(np.int32))
    table = jnp.asarray(rng.permutation(k).astype(np.int32))
    r1 = pr.remap(lab, table, k, interpret=True)
    r0 = red.remap_sweep(lab, table, k)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
    # negatives preserved
    assert np.all(np.asarray(r1)[np.asarray(lab) < 0] == -1)


def test_grid_shaped_inputs():
    # callers pass 3-D grids; outputs keep grid shape for remap
    rng = np.random.default_rng(3)
    shape = (12, 14, 16)
    k = 9
    lab = jnp.asarray(rng.integers(-1, k, size=shape).astype(np.int32))
    table = jnp.asarray(np.arange(k)[::-1].copy().astype(np.int32))
    out = pr.remap(lab, table, k, interpret=True)
    assert out.shape == shape
    r0 = red.remap_sweep(lab, table, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(r0))


def test_surface_kernel_matches_compaction_path():
    """Pallas surface-distance kernel (interpret) vs the f64 edge-
    compaction path on a random label map."""
    import jax.numpy as jnp
    from pybader_tpu.ops import atoms as atoms_ops
    from pybader_tpu.ops.pallas_reduce import surface_min_d2

    rng = np.random.default_rng(7)
    shape = (12, 10, 16)
    n_atoms = 5
    lattice = np.array([[6.0, 0.3, 0.0], [0.0, 5.5, 0.2], [0.1, 0.0, 5.0]])
    labels = rng.integers(-1, n_atoms, size=shape).astype(np.int32)
    mask = rng.random(shape) < 0.2
    atoms_cart = rng.random((n_atoms, 3)) @ lattice

    d_ref = np.asarray(atoms_ops.surface_distance_masked(
        jnp.asarray(labels), jnp.asarray(mask), lattice, atoms_cart,
        n_atoms))  # CPU backend -> compaction fallback (f64)
    d2 = surface_min_d2(
        jnp.asarray(labels), jnp.asarray(mask), jnp.asarray(lattice),
        jnp.asarray(atoms_cart), shape, n_atoms, interpret=True)
    d_pl = np.asarray(jnp.where(jnp.isfinite(d2), jnp.sqrt(d2), 0.0))
    np.testing.assert_allclose(d_pl, d_ref, rtol=2e-5, atol=2e-6)


def test_surface_kernel_no_edges_atom():
    """An atom whose volume has no edge voxels reports 0.0 (reference
    thread_handlers.py:289-297)."""
    import jax.numpy as jnp
    from pybader_tpu.ops.pallas_reduce import surface_min_d2

    shape = (8, 8, 16)
    lattice = np.diag([4.0, 4.0, 4.0])
    labels = np.zeros(shape, np.int32)
    labels[4:] = 1
    mask = np.zeros(shape, bool)
    mask[labels == 0] = True  # only atom 0 has edges
    atoms_cart = np.array([[1.0, 1.0, 1.0], [3.0, 3.0, 3.0]])
    d2 = surface_min_d2(
        jnp.asarray(labels), jnp.asarray(mask), jnp.asarray(lattice),
        jnp.asarray(atoms_cart), shape, 2, interpret=True)
    assert np.isfinite(float(d2[0]))
    assert np.isinf(float(d2[1]))
