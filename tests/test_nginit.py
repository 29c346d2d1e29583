"""Neargrid-first-step flood init (the nginit hybrid path, ADVICE r4).

`stencil.neargrid_init_codes` underwrites the scan-flood labeller with
two structural claims (its docstring): every substituted first-step code
STRICTLY ascends the density (everything else falls back to the ongrid
code), and the roots of the resulting pointer graph are exactly the
ongrid maxima.  Strict ascent + an acyclic fallback graph => the whole
graph is acyclic, which is what both the scan flood and the pointer
resolution depend on.  Nothing exercised this before
(`PYBADER_TPU_HYBRID_INIT=nginit` is reachable from partition_neargrid).

Three pins on randomized gaussian-mixture fields:
  1. the structural claims themselves (numpy, no labeller involved);
  2. scan-flood labels on nginit codes == pointer-resolution labels on
     the same codes (the two labellers agree => the graph is consistent);
  3. the end-to-end nginit hybrid converges to the same charges as the
     default hybrid (reference ground-truth definition, ('changed', -1)).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_hybrid_parity import LATTICE, _density

from pybader_tpu import grid as g
from pybader_tpu import pipeline
from pybader_tpu.ops import reductions, scanflood
from pybader_tpu.ops.pointer import label_volumes
from pybader_tpu.ops.stencil import (
    neargrid_init_codes, ongrid_step_codes, parent_from_step_codes,
)

from pybader_tpu.grid import OFFSETS


def _codes(rho, shape):
    w = tuple(g.distance_weights(LATTICE, shape))
    tg = g.t_grad(LATTICE, shape)
    bk_og = ongrid_step_codes(jnp.asarray(rho), w)
    codes = neargrid_init_codes(jnp.asarray(rho), bk_og, jnp.asarray(tg))
    return np.asarray(bk_og), np.asarray(codes)


@pytest.mark.parametrize("seed", (0, 3))
def test_nginit_codes_strict_ascent_and_roots(seed):
    shape = (24, 28, 32)
    rho = _density(shape, seed)
    bk_og, codes = _codes(rho, shape)
    # roots exactly the ongrid maxima
    np.testing.assert_array_equal(codes == 13, bk_og == 13)
    # every code that differs from the ongrid fallback strictly ascends
    subst = (codes != bk_og) & (codes != 13)
    assert subst.any()  # the init actually moved some pointers
    ix, iy, iz = np.indices(shape)
    off = np.asarray(OFFSETS)[codes]
    tx = (ix + off[..., 0]) % shape[0]
    ty = (iy + off[..., 1]) % shape[1]
    tz = (iz + off[..., 2]) % shape[2]
    assert np.all(rho[tx, ty, tz][subst] > rho[subst])


@pytest.mark.parametrize("seed", (1, 4))
def test_nginit_scanflood_matches_pointer_resolution(seed):
    shape = (32, 32, 32)
    rho = _density(shape, seed)
    _, codes = _codes(rho, shape)
    codes_d = jnp.asarray(codes)
    labels_mo, n_max = scanflood.labels_scanflood(codes_d)
    iota = jnp.arange(int(np.prod(shape)), dtype=jnp.int32).reshape(shape)
    labels_a, maxima_a = pipeline.renumber_discovery(
        labels_mo, codes_d == jnp.uint8(13), None, max(int(n_max), 1),
        iota)
    labels_b, maxima_b = label_volumes(
        parent_from_step_codes(codes_d), None, codes_d)
    np.testing.assert_array_equal(np.asarray(labels_a),
                                  np.asarray(labels_b))
    np.testing.assert_array_equal(np.asarray(maxima_a),
                                  np.asarray(maxima_b))


@pytest.mark.parametrize("seed", (2, 5))
def test_nginit_hybrid_converges_to_ground_truth(seed, monkeypatch):
    shape = (48, 48, 48)
    rho = _density(shape, seed)
    w = tuple(g.distance_weights(LATTICE, shape))
    tg = g.t_grad(LATTICE, shape)

    def converged(init_env):
        if init_env:
            monkeypatch.setenv("PYBADER_TPU_HYBRID_INIT", init_env)
        else:
            monkeypatch.delenv("PYBADER_TPU_HYBRID_INIT", raising=False)
        labels, maxima = pipeline.partition_neargrid(
            rho, None, w, tg, full_trajectories=False)
        labels, _ = pipeline.refine_labels(
            "neargrid", ("changed", -1), rho, labels, w, tg,
            verbose=False)
        vox = g.voxel_volume(LATTICE, shape)
        charge, _ = reductions.charge_volume_sum(
            jnp.asarray(rho), labels, vox, len(maxima))
        return np.sort(np.asarray(charge)), len(maxima)

    q_ng, n_ng = converged("nginit")
    q_def, n_def = converged(None)
    assert n_ng == n_def
    assert np.max(np.abs(q_ng - q_def)) < 1e-6
