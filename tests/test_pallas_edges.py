"""Interpret-mode parity of the Pallas edge kernels vs the XLA stencils."""
import numpy as np
import jax.numpy as jnp

from tests.oracle import gaussian_density

from pybader_tpu import grid as g
from pybader_tpu import pipeline
from pybader_tpu.ops import edges as E
from pybader_tpu.ops import pallas_edges as PE
from pybader_tpu.ops.stencil import ongrid_step_codes

LAT = np.diag([8.0, 9.0, 10.0])


def _setup(shape, seed, vac_q=None):
    rng = np.random.default_rng(seed)
    rho = gaussian_density(
        shape, LAT, rng.random((6, 3)), 0.5 + rng.random(6),
        1 + 2 * rng.random(6)) + 1e-9
    w = tuple(g.distance_weights(LAT, shape))
    vac = None if vac_q is None else rho <= np.quantile(rho, vac_q)
    labels, _ = pipeline.partition_ongrid(rho, vac, w)
    bk = ongrid_step_codes(jnp.asarray(rho), w)
    if vac is not None:
        bk = jnp.where(jnp.asarray(vac), jnp.uint8(13), bk)
        is_max = (bk == jnp.uint8(13)) & ~jnp.asarray(vac)
    else:
        is_max = bk == jnp.uint8(13)
    return rho, labels, is_max


def test_edge_find_matches_xla():
    for shape, seed, q in (((16, 32, 128), 0, 0.25), ((8, 64, 128), 1, None)):
        rho, labels, is_max = _setup(shape, seed, q)
        kn_x = E._edge_find_xla(jnp.asarray(rho), labels, is_max)
        kn_p = PE.edge_find(labels, is_max, interpret=True)
        assert int(jnp.sum(kn_x != kn_p)) == 0, (shape, seed)


def test_edge_check_matches_xla():
    shape = (16, 32, 128)
    rho, labels, is_max = _setup(shape, 2, 0.3)
    kn = E._edge_find_xla(jnp.asarray(rho), labels, is_max)
    # simulate a refinement iteration's known dance: some edges drop to
    # -1 (unchanged), some voxels get relabelled
    rng = np.random.default_rng(3)
    ed = np.asarray(kn) == -2
    kn_mod = np.where((rng.random(shape) < 0.5) & ed, -1,
                      np.asarray(kn)).astype(np.int8)
    lab_mod = np.asarray(labels).copy()
    sel = (rng.random(shape) < 0.1) & ed
    lab_mod[sel] = (lab_mod[sel] + 1) % int(lab_mod.max() + 1)
    ck_x = E._edge_check_xla(jnp.asarray(kn_mod), jnp.asarray(rho),
                             jnp.asarray(lab_mod), is_max)
    ck_p = PE.edge_check(jnp.asarray(kn_mod), jnp.asarray(lab_mod),
                         is_max, interpret=True)
    assert int(jnp.sum(ck_x != ck_p)) == 0


def test_dd_stencil_interpret_matches_exact_f64():
    """The dd stencil (interpret mode) equals the exact-f64 XLA stencil
    bit-for-bit on a gaussian-mixture field."""
    import jax

    from pybader_tpu.ops import pallas_stencil as ps

    shape = (16, 16, 128)
    lat = np.diag([7.0, 8.0, 9.0])
    rng = np.random.default_rng(1)
    rho = gaussian_density(
        shape, lat, rng.random((5, 3)), 0.5 + rng.random(5),
        1 + 2 * rng.random(5)) + 1e-9
    w = tuple(g.distance_weights(lat, shape))
    rho_d = jnp.asarray(rho)
    hi = rho_d.astype(jnp.float32)
    lo = (rho_d - hi.astype(jnp.float64)).astype(jnp.float32)
    with jax.enable_x64(False):
        bk_p = ps._stencil_call(hi, lo, w, 8, 8, 8, interpret=True)
    bk_x = ongrid_step_codes(rho_d, w)
    assert int(jnp.sum(bk_p.astype(jnp.int32)
                       != bk_x.astype(jnp.int32))) == 0


def test_flood_scan_interpret_matches_xla():
    """One Pallas directional flood scan (interpret) == the XLA
    grouped-plane scan, both directions, all axes."""
    import jax

    from pybader_tpu import pipeline
    from pybader_tpu.ops import pallas_flood as pf
    from pybader_tpu.ops import scanflood as sf
    from pybader_tpu.ops.pallas_chase import _flood_seed

    shape = (32, 32, 128)
    lat = np.diag([7.0, 8.0, 9.0])
    rng = np.random.default_rng(4)
    rho = gaussian_density(
        shape, lat, rng.random((6, 3)), 0.5 + rng.random(6),
        1 + 2 * rng.random(6)) + 1e-9
    w = tuple(g.distance_weights(lat, shape))
    bk = ongrid_step_codes(jnp.asarray(rho), w)
    with jax.enable_x64(False):
        seed, _, _ = _flood_seed(bk, bk, False)
        codes = [sf._axis_codes(bk, a) for a in range(3)]
        lab = seed
        for axis in range(3):
            comp, inplane = codes[axis]
            for reverse in (False, True):
                ref = sf.scan_flood_dir(
                    lab + 0, comp, inplane, axis, reverse, 1)
                lm = jnp.moveaxis(lab, axis, 0)
                got = pf._scan_call(
                    lm, jnp.moveaxis(comp, axis, 0),
                    jnp.moveaxis(inplane, axis, 0), reverse,
                    interpret=True)
                got = jnp.moveaxis(got, 0, axis)
                assert int(jnp.sum(got != ref)) == 0, (axis, reverse)
                lab = ref  # advance so later scans see realistic state
