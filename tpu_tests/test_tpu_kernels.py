"""On-device validation of the Pallas kernels (round-1 verdict item 6).

Asserts, on the real TPU:
 - the double-float Pallas stencil produces step codes identical to the
   exact-f64 XLA stencil;
 - the one-shot Pallas label chase produces labels identical to XLA pointer
   doubling + compaction;
 - the full product partition (chase + discovery renumbering) matches the
   CPU-validated pipeline structure (maxima are self-labelled, discovery
   order ascending in first-member flat index).

Grids: randomized gaussian-blob mixtures at several shapes, vacuum on and
off, plus a noise field with thousands of basins (stressing the dense-label
seeding towards the 4096-basin fallback edge).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pybader_tpu import grid as g
from pybader_tpu.ops import pallas_chase, pallas_stencil
from pybader_tpu.ops.pointer import resolve_roots
from pybader_tpu.ops.stencil import ongrid_step_codes, parent_from_step_codes


def blob_density(shape, n_blobs, seed, blur=150.0, bg_amp=10.0,
                 bg_blur=15000.0):
    """Sharp blobs on a smooth interstitial background (bench-field
    construction): without the background the field is numerically ~zero
    between blobs and f64 FFT noise spawns thousands of one-voxel basins
    (round-2 lesson; it also made the label-loop kernels' kp explode in
    these tests — VERDICT r4)."""
    rng = np.random.default_rng(seed)
    rho = np.zeros(shape)
    idx = tuple(rng.integers(0, s, size=n_blobs) for s in shape)
    rho[idx] = rng.uniform(1.0, 3.0, size=n_blobs)
    k2 = sum(
        np.fft.fftfreq(s).reshape([-1 if i == d else 1 for i in range(3)])
        ** 2
        for d, s in enumerate(shape)
    )
    filt = np.exp(-k2 * blur) + bg_amp * np.exp(-k2 * bg_blur)
    rho = np.real(np.fft.ifftn(np.fft.fftn(rho) * filt))
    return np.ascontiguousarray(rho - rho.min() + 1e-9)


CASES = [
    ((128, 128, 128), 12, 0, False),
    ((128, 128, 128), 20, 1, True),
    ((96, 64, 128), 8, 2, False),
    ((160, 96, 256), 30, 3, True),
    ((64, 64, 128), 5, 4, True),
]


def _setup(shape, n_blobs, seed, vacuum):
    rho = blob_density(shape, n_blobs, seed)
    lattice = np.diag([10.0, 11.0, 12.0])
    w = tuple(g.distance_weights(lattice, shape))
    rho_dev = jnp.asarray(rho)
    vac = (rho_dev <= 2e-2 * float(rho.max())) if vacuum else None
    return rho_dev, w, vac


@pytest.mark.parametrize("shape,n_blobs,seed,vacuum", CASES)
def test_dd_stencil_matches_exact_f64(shape, n_blobs, seed, vacuum):
    rho_dev, w, vac = _setup(shape, n_blobs, seed, vacuum)
    assert pallas_stencil.supports_shape(shape)
    bk_dd = pallas_stencil.ongrid_step_codes_dd(rho_dev, w)
    bk_f64 = ongrid_step_codes(rho_dev, w)
    mism = int(jnp.sum(bk_dd != bk_f64))
    assert mism == 0, f"{mism} step-code mismatches dd vs exact f64"


@pytest.mark.parametrize("shape,n_blobs,seed,vacuum", CASES)
def test_oneshot_chase_matches_pointer_doubling(shape, n_blobs, seed,
                                                vacuum):
    rho_dev, w, vac = _setup(shape, n_blobs, seed, vacuum)
    assert pallas_chase.supports_shape(shape)
    bk = ongrid_step_codes(rho_dev, w)
    if vac is not None:
        bk = jnp.where(vac, jnp.uint8(13), bk)
    labels, n_max = pallas_chase.labels_oneshot(bk, vac)
    # reference: XLA pointer doubling to roots, then rank compaction in
    # maximum-flat-index order (the one-shot chase's label order)
    parent = parent_from_step_codes(bk)
    roots = resolve_roots(parent).reshape(-1)
    is_max = (bk == jnp.uint8(13)).reshape(-1)
    if vac is not None:
        is_max = is_max & ~vac.reshape(-1)
    n = roots.shape[0]
    mx_sorted = jnp.sort(
        jnp.where(is_max, jnp.arange(n, dtype=jnp.int32), jnp.int32(n)))
    want_n = int(jnp.sum(is_max))
    want = jnp.searchsorted(mx_sorted, roots).astype(jnp.int32)
    if vac is not None:
        want = jnp.where(vac.reshape(-1), jnp.int32(-1), want)
    assert n_max == want_n
    mism = int(jnp.sum(labels.reshape(-1) != want))
    assert mism == 0, f"{mism} label mismatches chase vs doubling"


def test_many_basin_noise_field():
    """Thousands of basins: dense seeding far beyond the blob regime."""
    shape = (128, 128, 128)
    rng = np.random.default_rng(42)
    rho = rng.uniform(0.5, 1.0, size=shape)
    # mild smoothing keeps plateaus away but leaves very many maxima
    k2 = sum(
        np.fft.fftfreq(s).reshape([-1 if i == d else 1 for i in range(3)])
        ** 2
        for d, s in enumerate(shape)
    )
    rho = np.real(np.fft.ifftn(np.fft.fftn(rho) * np.exp(-k2 * 20.0)))
    rho = np.ascontiguousarray(rho - rho.min() + 1e-9)
    w = tuple(g.distance_weights(np.diag([10.0, 10.0, 10.0]), shape))
    rho_dev = jnp.asarray(rho)
    bk = ongrid_step_codes(rho_dev, w)
    labels, n_max = pallas_chase.labels_oneshot(bk, None)
    assert n_max > 1000, f"noise field produced only {n_max} basins"
    parent = parent_from_step_codes(bk)
    roots = resolve_roots(parent).reshape(-1)
    n = roots.shape[0]
    is_max = (bk == jnp.uint8(13)).reshape(-1)
    mx_sorted = jnp.sort(
        jnp.where(is_max, jnp.arange(n, dtype=jnp.int32), jnp.int32(n)))
    want = jnp.searchsorted(mx_sorted, roots).astype(jnp.int32)
    mism = int(jnp.sum(labels.reshape(-1) != want))
    assert mism == 0, f"{mism} label mismatches on {n_max}-basin field"


def test_product_partition_on_tpu():
    """Full product path on TPU: renumbering invariants hold."""
    from pybader_tpu import pipeline

    shape = (128, 128, 128)
    rho = blob_density(shape, 15, 7)
    w = tuple(g.distance_weights(np.diag([10.0] * 3), shape))
    rho_dev = jnp.asarray(rho)
    vac = rho_dev <= 1e-3 * float(rho.max())
    labels, maxima = pipeline.partition_ongrid(rho_dev, vac, w)
    labels_h = np.asarray(labels)
    n_max = len(maxima)
    assert n_max >= 1
    # each maximum voxel is labelled with its own (discovery-order) id
    for k, m in enumerate(np.asarray(maxima)):
        assert labels_h[tuple(m)] == k
    # discovery order: ascending first-member flat index
    flat = labels_h.reshape(-1)
    firsts = [int(np.argmax(flat == k)) for k in range(n_max)]
    assert firsts == sorted(firsts)
    # vacuum stays -1 and non-vacuum is fully assigned
    vac_h = np.asarray(vac)
    assert (labels_h[vac_h] == -1).all()
    assert (labels_h[~vac_h] >= 0).all()


def test_charge_sums_split_f32_matches_f64():
    """TPU two-level split-f32 sums vs the f64 segment path (tolerance)."""
    from pybader_tpu.ops.reductions import charge_volume_sum

    shape = (128, 128, 128)
    rho = blob_density(shape, 10, 11)
    w = tuple(g.distance_weights(np.diag([10.0] * 3), shape))
    rho_dev = jnp.asarray(rho)
    bk = ongrid_step_codes(rho_dev, w)
    labels, n_max = pallas_chase.labels_oneshot(bk, None)
    charge, volume = charge_volume_sum(rho_dev, labels, 1.0, int(n_max))
    charge_h = np.asarray(charge)
    # host f64 reference
    lab_h = np.asarray(labels).reshape(-1)
    rho_h = np.asarray(rho_dev).reshape(-1)
    for k in range(int(n_max)):
        want = rho_h[lab_h == k].sum()
        assert abs(charge_h[k] - want) < 1e-6 + 1e-8 * abs(want)
    np.testing.assert_allclose(
        np.asarray(volume),
        np.asarray([(lab_h == k).sum() for k in range(int(n_max))],
                   dtype=float))


@pytest.mark.parametrize("shape,n_blobs,seed,vacuum", CASES)
def test_scanflood_matches_pointer_doubling(shape, n_blobs, seed, vacuum):
    """Directional-scan flooding (the production label backend) vs XLA
    pointer doubling, on-device."""
    from pybader_tpu.ops import scanflood

    rho_dev, w, vac = _setup(shape, n_blobs, seed, vacuum)
    bk = ongrid_step_codes(rho_dev, w)
    if vac is not None:
        bk = jnp.where(vac, jnp.uint8(13), bk)
    labels, n_max = scanflood.labels_scanflood(bk, vac)
    parent = parent_from_step_codes(bk)
    roots = resolve_roots(parent).reshape(-1)
    n = roots.shape[0]
    is_max = (bk == jnp.uint8(13)).reshape(-1)
    if vac is not None:
        is_max = is_max & ~vac.reshape(-1)
    mx_sorted = jnp.sort(
        jnp.where(is_max, jnp.arange(n, dtype=jnp.int32), jnp.int32(n)))
    want = jnp.searchsorted(mx_sorted, roots).astype(jnp.int32)
    if vac is not None:
        want = jnp.where(vac.reshape(-1), jnp.int32(-1), want)
    assert n_max == int(jnp.sum(is_max))
    mism = int(jnp.sum(labels.reshape(-1) != want))
    assert mism == 0, f"{mism} scanflood label mismatches"


def test_permuted_dd_stencil_matches_exact():
    """A shape the dd stencil can only tile after an axis permutation
    (nz not a 128-multiple, nx is) must produce exact-f64 step codes
    through the permuted kernel with original-order tie-breaks."""
    from pybader_tpu import pipeline

    shape = (256, 120, 136)
    assert not pallas_stencil.supports_shape(shape)
    assert pallas_stencil.find_supported_perm(shape) is not None
    rho = blob_density(shape, 10, 5)
    w = tuple(g.distance_weights(np.diag([10.0, 9.0, 8.0]), shape))
    rho_dev = jnp.asarray(rho)
    bk_fast = pipeline._step_codes_auto(rho_dev, w)
    bk_exact = ongrid_step_codes(rho_dev, w)
    mism = int(jnp.sum(bk_fast != bk_exact))
    assert mism == 0, f"{mism} permuted-stencil mismatches"


def test_odd_shape_partition_runs_and_times():
    """A shape with NO supported permutation (250 has no 8-divisible
    split) must still partition correctly via the XLA stencil +
    scanflood; the recorded timing documents the off-path cost."""
    import time

    from pybader_tpu import pipeline
    from pybader_tpu.ops import pallas_stencil as ps

    shape = (250, 240, 250)
    assert ps.find_supported_perm(shape) is None
    rho = blob_density(shape, 12, 6)
    w = tuple(g.distance_weights(np.diag([10.0] * 3), shape))
    rho_dev = jnp.asarray(rho)
    t0 = time.perf_counter()
    labels, maxima = pipeline.partition_ongrid(rho_dev, None, w)
    n_max = len(maxima)
    dt = time.perf_counter() - t0
    n = int(np.prod(shape))
    print(f"\nodd-shape {shape}: {dt:.2f}s cold ({n/dt/1e6:.1f} Mvox/s), "
          f"{n_max} basins")
    # correctness vs doubling path
    bk = ongrid_step_codes(rho_dev, w)
    parent = parent_from_step_codes(bk)
    roots = resolve_roots(parent).reshape(-1)
    is_max = (bk == jnp.uint8(13)).reshape(-1)
    mx_sorted = jnp.sort(jnp.where(
        is_max, jnp.arange(n, dtype=jnp.int32), jnp.int32(n)))
    lab_mo = jnp.searchsorted(mx_sorted, roots).astype(jnp.int32)
    # compare charges per basin (renumbering differs only by order)
    from pybader_tpu.ops.reductions import charge_volume_sum

    c1, _ = charge_volume_sum(rho_dev, labels, 1.0, n_max)
    c2, _ = charge_volume_sum(rho_dev, lab_mo.reshape(shape), 1.0, n_max)
    np.testing.assert_allclose(np.sort(np.asarray(c1)),
                               np.sort(np.asarray(c2)), rtol=1e-10)


def test_packed_walker_matches_inline_walker():
    """The one-gather packed walker == the inline 9-gather walker,
    on-device (refinement semantics, strict gradient)."""
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import neargrid as ng
    from pybader_tpu.ops.reductions import compact_indices

    shape = (96, 64, 128)
    rho = blob_density(shape, 8, 9)
    lattice = np.diag([9.0, 8.0, 10.0])
    w = tuple(g.distance_weights(lattice, shape))
    tg = jnp.asarray(g.t_grad(lattice, shape))
    rho_dev = jnp.asarray(rho)
    bk = ongrid_step_codes(rho_dev, w)
    parent = parent_from_step_codes(bk)
    from pybader_tpu import pipeline

    labels, _ = pipeline.partition_ongrid(rho_dev, None, w)
    known = edges_ops.edge_find(rho_dev, labels, bk == jnp.uint8(13))
    edge_mask = (known == -2).reshape(-1)
    n_edges = int(jnp.sum(edge_mask))
    starts = compact_indices(edge_mask, 1 << 14)
    stop = (known == 2).reshape(-1)
    pos_a, done_a = ng.walk(
        starts, rho_dev.reshape(-1), parent.reshape(-1), stop, tg,
        shape, strict_grad=True, max_steps=192)
    pos_b, done_b = ng.walk_drain(
        starts, rho_dev.reshape(-1), parent.reshape(-1), stop, tg,
        shape, strict_grad=True, max_steps=192,
        rows_dtype=jnp.float64)
    assert n_edges > 0
    mism = int(jnp.sum(pos_a != pos_b)) + int(jnp.sum(done_a != done_b))
    assert mism == 0, f"{mism} walker mismatches packed vs inline"
    # the default TPU policy walks f32 rows (2.2x the gather rate);
    # divergence from the f64 walk is bounded to numerical knife edges
    # (trajectories within ~1e-7 of a 0.5 rounding threshold)
    pos_c, done_c = ng.walk_drain(
        starts, rho_dev.reshape(-1), parent.reshape(-1), stop, tg,
        shape, strict_grad=True, max_steps=192)
    lab_flat = labels.reshape(-1)
    lab_b = jnp.take(lab_flat, pos_b, mode="clip")
    lab_c = jnp.take(lab_flat, pos_c, mode="clip")
    diff = int(jnp.sum((lab_b != lab_c) & (starts >= 0)))
    assert bool(jnp.all(done_c == done_b))
    assert diff <= max(4, n_edges // 1000), (
        f"f32-row walk diverges from f64 on {diff}/{n_edges} edges")
    print(f"    (f32-row walk: {diff}/{n_edges} knife-edge label diffs)")


def test_pallas_label_reductions_match_xla():
    """Pallas per-label min-pair/remap kernels vs the XLA masked sweeps,
    on-device, including a non-128-multiple flat size (padding path)."""
    from pybader_tpu.ops import pallas_reduce as pr
    from pybader_tpu.ops import reductions as red

    shape = (96, 72, 120)  # 829440 voxels: not a multiple of 128
    rho = blob_density(shape, 12, 13)
    w = tuple(g.distance_weights(np.diag([9.0, 7.0, 11.0]), shape))
    rho_dev = jnp.asarray(rho)
    bk = ongrid_step_codes(rho_dev, w)
    from pybader_tpu import pipeline

    labels, maxima = pipeline.partition_ongrid(rho_dev, None, w)
    n_max = len(maxima)
    is_max = bk == jnp.uint8(13)
    iota = jnp.arange(rho_dev.size, dtype=jnp.int32)
    mn, mm = pr.min_pair(labels, is_max, n_max)
    mn0, mm0 = red.masked_min_pair(iota, labels.reshape(-1),
                                   is_max.reshape(-1), n_max)
    np.testing.assert_array_equal(np.asarray(mn), np.asarray(mn0))
    np.testing.assert_array_equal(np.asarray(mm), np.asarray(mm0))
    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.permutation(n_max).astype(np.int32))
    r1 = pr.remap(labels, table, n_max)
    r0 = red.remap_sweep(labels, table, n_max)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
    c1, v1 = pr.charge_volume(rho_dev, labels, 1.0, n_max)
    c0, v0 = red._charge_volume_sum_xla(rho_dev, labels, 1.0, n_max)
    # ground truth in host f64: both device paths are split-f32
    # accumulations that differ from it (and from each other) only by
    # f32 summation order — hold both to the same truth-relative bound
    lab_h = np.asarray(labels).reshape(-1)
    truth = np.bincount(lab_h[lab_h >= 0],
                        weights=rho[np.asarray(labels) >= 0],
                        minlength=n_max)
    np.testing.assert_allclose(np.asarray(c1), truth, rtol=1e-6,
                               atol=1e-9 * truth.max())
    np.testing.assert_allclose(np.asarray(c0), truth, rtol=1e-6,
                               atol=1e-9 * truth.max())
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))


@pytest.mark.parametrize("shape", [(128, 128, 128), (160, 128, 384)])
def test_pallas_flood_matches_xla_scans(shape):
    """The VMEM-carry flood-scan kernel is bit-identical to the XLA
    plane scans, on-device, including a non-cubic tileable shape."""
    import jax

    from pybader_tpu import pipeline
    from pybader_tpu.ops import pallas_flood
    from pybader_tpu.ops import scanflood as sf
    from pybader_tpu.ops.pallas_chase import _flood_seed

    assert pallas_flood.supports_shape(shape)
    rho = blob_density(shape, 14, 9)
    w = tuple(g.distance_weights(np.diag([9.0, 8.0, 11.0]), shape))
    rho_dev = jnp.asarray(rho)
    bk = pipeline._step_codes_auto(rho_dev, w)
    with jax.enable_x64(False):
        seed0, _, _ = _flood_seed(bk, bk, False)
        codes = [sf._axis_codes(bk, a) for a in range(3)]
        xla_round = sf._make_round(shape, codes, force_xla=True)
        pl_round = sf._make_round(shape, codes)
        lab_x = jnp.array(seed0, copy=True)
        lab_p = jnp.array(seed0, copy=True)
        for _round in range(3):
            lab_x, cnt_x = xla_round(lab_x)
            lab_p, cnt_p = pl_round(lab_p)
            assert int(cnt_x) == int(cnt_p)
            mism = int(jnp.sum(lab_x != lab_p))
            assert mism == 0, f"{mism} mismatches after a round"


def test_packed_compaction_bit_exact():
    """_compact_state's single-row-gather packing must preserve every int
    pattern: -1 sentinels (NaN bits under an f32 view) and small indices
    (denormal bits).  An earlier f32-matrix packing corrupted both on TPU
    (NaN canonicalisation + denormal flush); the int32-matrix packing is
    pinned here."""
    import jax

    from pybader_tpu.ops import neargrid as ng

    rng = np.random.default_rng(0)
    k, size = 1 << 14, 1 << 13
    pos = rng.integers(0, 1 << 27, size=k).astype(np.int32)
    prev = np.where(rng.random(k) < 0.3, -1,
                    rng.integers(0, 1 << 27, size=k)).astype(np.int32)
    hist = np.where(rng.random((k, 3)) < 0.3, -1,
                    rng.integers(0, 1 << 27, size=(k, 3))).astype(np.int32)
    dr = (rng.random((k, 3)) - 0.5).astype(np.float32)
    done = rng.random(k) < 0.4
    done[: k - size + 64] = True  # alive set fits the target bucket
    state = tuple(jnp.asarray(a) for a in (pos, prev, hist, dr, done))
    with jax.enable_x64(False):
        packed, kept, dropped_w, dropped = ng._compact_state(state, size)
    kept_h = np.asarray(kept)
    for got, exp in zip(packed, (pos, prev, hist, dr, done)):
        got_h = np.asarray(got)
        if got_h.dtype == np.float32:
            np.testing.assert_array_equal(got_h.view(np.int32),
                                          exp[kept_h].view(np.int32))
        else:
            np.testing.assert_array_equal(got_h, exp[kept_h])
    # dropped lanes: packed result words must carry pos and done exactly
    drop_h = np.asarray(dropped)
    w_h = np.asarray(dropped_w)
    np.testing.assert_array_equal(w_h & ((1 << 30) - 1), pos[drop_h])
    np.testing.assert_array_equal(w_h < 0, done[drop_h])


def test_walk_drain_schedule_invariant():
    """Two f32-row drains with different segment schedules (hence
    different compaction points) must agree EXACTLY — they walk identical
    per-lane programs, so any difference is compaction corruption."""
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import neargrid as ng
    from pybader_tpu.ops.reductions import compact_indices

    shape = (96, 64, 128)
    rho = blob_density(shape, 8, 9)
    lattice = np.diag([9.0, 8.0, 10.0])
    w = tuple(g.distance_weights(lattice, shape))
    tg = jnp.asarray(g.t_grad(lattice, shape))
    rho_dev = jnp.asarray(rho)
    bk = ongrid_step_codes(rho_dev, w)
    parent = parent_from_step_codes(bk)
    from pybader_tpu import pipeline

    labels, _ = pipeline.partition_ongrid(rho_dev, None, w)
    known = edges_ops.edge_find(rho_dev, labels, bk == jnp.uint8(13))
    edge_mask = (known == -2).reshape(-1)
    starts = compact_indices(edge_mask, 1 << 14)
    stop = (known == 2).reshape(-1)
    args = (starts, rho_dev.reshape(-1), parent.reshape(-1), stop, tg,
            shape)
    pos_a, done_a = ng.walk_drain(*args, strict_grad=True, max_steps=192)
    pos_b, done_b = ng.walk_drain(*args, strict_grad=True, max_steps=192,
                                  segments=(1, 1, 2, 4, 8, 16),
                                  min_batch=4096)
    mism = int(jnp.sum(pos_a != pos_b)) + int(jnp.sum(done_a != done_b))
    assert mism == 0, f"{mism} schedule-dependent walker results"


def test_qrow_walkers_on_device():
    """The shipping TPU walk path — 19-bit q-rows, exactness screen,
    drain compaction — validated on hardware (VERDICT r4 weak #5).

    Three claims, all on the same refinement-class edge set:
      1. the UNSCREENED q-walker is trajectory-identical to the f32
         packed walker on the dequantised gradient field (isolates the
         walker logic from the quantisation);
      2. the SCREENED walk (q-rows + per-lane proof + exact re-walks) is
         bit-identical to walking every lane on the exact rows — the
         guarantee user-visible refinement relies on;
      3. the screen actually fires on a realistic field (not vacuous)
         and flags only a small fraction.
    Sub-32-bit Mosaic/XLA-TPU numerics are exactly where such claims
    break (commit bc62767), hence the on-device pin.
    """
    from pybader_tpu import pipeline
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import neargrid as ng
    from pybader_tpu.ops.reductions import compact_indices

    shape = (96, 64, 128)
    rho = blob_density(shape, 8, 9)
    lattice = np.diag([9.0, 8.0, 10.0])
    w = tuple(g.distance_weights(lattice, shape))
    tg = jnp.asarray(g.t_grad(lattice, shape))
    rho_dev = jnp.asarray(rho)
    bk = ongrid_step_codes(rho_dev, w)
    parent = parent_from_step_codes(bk)
    labels, _ = pipeline.partition_ongrid(rho_dev, None, w)
    known = edges_ops.edge_find(rho_dev, labels, bk == jnp.uint8(13))
    starts = compact_indices((known == -2).reshape(-1), 1 << 14)
    stop = (known == 2).reshape(-1)

    qrows = ng.precompute_qrows(rho_dev, bk, tg, strict_grad=True)
    q_baked = ng.update_stop_q(qrows, stop)

    # 1: unscreened q-walk vs f32 rows carrying the SAME dequantised field
    from tests.test_qrows import _dequantized_f32_rows

    frows = _dequantized_f32_rows(q_baked, bk)
    f_baked = ng.update_stop(frows, stop)
    pos_q, done_q = ng.walk_drain(
        starts, None, None, None, tg, shape, strict_grad=True,
        max_steps=192, fields=q_baked)
    pos_f, done_f = ng.walk_drain(
        starts, None, None, None, tg, shape, strict_grad=True,
        max_steps=192, fields=f_baked)
    mism = int(jnp.sum(pos_q != pos_f)) + int(jnp.sum(done_q != done_f))
    assert mism == 0, f"{mism} q-vs-dequantised-f32 walker mismatches"

    # 2 + 3: screened walk vs exact-row walk, bit-identical
    exact = ng.precompute_rows(rho_dev, parent, tg, strict_grad=True)
    e_baked = ng.update_stop(exact, stop)
    stats = {}
    pos_s, done_s = ng.walk_drain_screened(
        starts, tg, shape, q_baked, lambda: e_baked, strict_grad=True,
        max_steps=192, stats=stats)
    pos_e, done_e = ng.walk_drain(
        starts, None, None, None, tg, shape, strict_grad=True,
        max_steps=192, fields=e_baked)
    mism = int(jnp.sum(pos_s != pos_e)) + int(jnp.sum(done_s != done_e))
    assert mism == 0, f"{mism} screened-vs-exact walker mismatches"
    n_lanes = int(jnp.sum(starts >= 0))
    assert stats["risky"] < max(64, n_lanes // 20), (
        f"screen flagged {stats['risky']}/{n_lanes} lanes risky")
    print(f"    (screen: {stats['risky']}/{n_lanes} risky lanes, "
          f"exact dtype {e_baked.dtype})")


def test_block_walker_on_device():
    """In-VMEM fold walker (ops/block_walk.py) vs the global HBM walker.

    The screened contract must hold ENGINE-INDEPENDENTLY: block rounds +
    global tail + exact re-walks return results bit-identical to
    exact-row walking whatever f32 scheduling Mosaic picked for the
    in-kernel steps (the _QS_EPS budget bounds against the EXACT walk,
    so kernel-vs-XLA rounding differences can only move lanes into the
    risky set, never corrupt a proven lane).  Also pins that the phase
    makes real progress on hardware rather than bailing out.
    """
    from pybader_tpu import pipeline
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import block_walk as bw
    from pybader_tpu.ops import neargrid as ng
    from pybader_tpu.ops.reductions import compact_indices

    shape = (96, 64, 128)  # conforms: 6x4x1 blocks of 16x16x128
    rho = blob_density(shape, 8, 9)
    lattice = np.diag([9.0, 8.0, 10.0])
    w = tuple(g.distance_weights(lattice, shape))
    tg = jnp.asarray(g.t_grad(lattice, shape))
    rho_dev = jnp.asarray(rho)
    bk = ongrid_step_codes(rho_dev, w)
    parent = parent_from_step_codes(bk)
    labels, _ = pipeline.partition_ongrid(rho_dev, None, w)
    known = edges_ops.edge_find(rho_dev, labels, bk == jnp.uint8(13))
    starts = compact_indices((known == -2).reshape(-1), 1 << 14)
    stop = (known == 2).reshape(-1)
    qrows = ng.precompute_qrows(rho_dev, bk, tg, strict_grad=True)
    q_baked = ng.update_stop_q(qrows, stop)
    exact = ng.precompute_rows(rho_dev, parent, tg, strict_grad=True)
    e_baked = ng.update_stop(exact, stop)

    old_en, old_min = bw._ENABLED, bw._MIN_LANES
    try:
        bw._ENABLED = False
        pos_off, done_off = ng.walk_drain_screened(
            starts, tg, shape, q_baked, lambda: e_baked,
            strict_grad=True, max_steps=192)

        bw._ENABLED = True
        bw._MIN_LANES = 1024
        # phase progress: rounds ran and retired lanes on hardware
        state = ng._init_state(starts, jnp.float32, screened=True)
        n_done0 = int(jnp.sum(state[4]))
        out, rounds = bw.block_phase(state, q_baked, shape,
                                     screened=True, max_rounds=4)
        assert rounds >= 1
        retired = int(jnp.sum(out[4])) - n_done0
        n_lanes = int(jnp.sum(starts >= 0))
        assert retired > n_lanes // 20, (
            f"block phase retired only {retired}/{n_lanes} lanes")

        pos_on, done_on = ng.walk_drain_screened(
            starts, tg, shape, q_baked, lambda: e_baked,
            strict_grad=True, max_steps=192)
    finally:
        bw._ENABLED, bw._MIN_LANES = old_en, old_min
    mism = int(jnp.sum(pos_on != pos_off)) \
        + int(jnp.sum(done_on != done_off))
    assert mism == 0, f"{mism} block-vs-global screened mismatches"
    print(f"    (block phase: {rounds} rounds, retired "
          f"{retired}/{n_lanes} lanes in-kernel)")


def test_pallas_surface_distance_matches_compaction():
    """surface_min_d2 on device vs the f64 edge-compaction path.

    Interpret mode agrees with the f64 path to 2e-5 relative
    (tests/test_pallas_reduce.py), i.e. the kernel math is right; the
    Mosaic-compiled kernel deviates up to ~4e-4 relative on v5e
    (measured r4 — device f32 contraction/rounding, both directions).
    The bound here pins that measured device deviation; the metric is a
    diagnostic length (reference prints 6 decimals of ~Å values), and
    PYBADER_TPU_DISABLE_PALLAS=surface restores the f64 path exactly."""
    from pybader_tpu import pipeline
    from pybader_tpu.ops import atoms as atoms_ops
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops.pallas_reduce import surface_min_d2
    from pybader_tpu.ops.reductions import compact_indices

    shape = (96, 96, 128)
    rho = blob_density(shape, 24, 11)
    lattice = np.array([[9.0, 0.4, 0.0], [0.0, 8.5, 0.3], [0.2, 0.0, 10.0]])
    w = tuple(g.distance_weights(lattice, shape))
    rho_dev = jnp.asarray(rho)
    labels, maxima = pipeline.partition_ongrid(rho_dev, None, w)
    n_atoms = len(maxima)
    rng = np.random.default_rng(2)
    atoms_cart = rng.random((n_atoms, 3)) @ lattice
    known = edges_ops.edge_find(rho_dev, labels)
    mask = known == -2

    d2 = surface_min_d2(labels, mask, jnp.asarray(lattice),
                        jnp.asarray(atoms_cart), shape, n_atoms)
    d_pl = np.asarray(jnp.where(jnp.isfinite(d2), jnp.sqrt(d2), 0.0))

    mask_flat = mask.reshape(-1)
    n_edges = int(jnp.sum(mask_flat))
    size = max(4096, 1 << (n_edges - 1).bit_length())
    edge_idx = compact_indices(mask_flat, size)
    d_ref = np.asarray(atoms_ops.surface_distance_from_edges(
        edge_idx, labels.reshape(-1), jnp.asarray(lattice),
        jnp.asarray(atoms_cart), shape, n_atoms))
    np.testing.assert_allclose(d_pl, d_ref, rtol=2e-3, atol=1e-4)


def test_pallas_edge_kernels_match_xla():
    """One-pass Pallas edge_find/edge_check vs the XLA roll stencils on
    device, through a real refinement iteration's known dance."""
    from pybader_tpu import pipeline
    from pybader_tpu.ops import edges as E
    from pybader_tpu.ops import pallas_edges as PE

    shape = (96, 96, 128)
    rho = blob_density(shape, 20, 13)
    lattice = np.diag([9.0, 9.0, 10.0])
    w = tuple(g.distance_weights(lattice, shape))
    rho_dev = jnp.asarray(rho)
    vac = rho_dev <= 2e-2 * float(rho.max())
    labels, _ = pipeline.partition_ongrid(rho_dev, vac, w)
    bk = ongrid_step_codes(rho_dev, w)
    bk = jnp.where(vac, jnp.uint8(13), bk)
    is_max = (bk == jnp.uint8(13)) & ~vac

    kn_x = E._edge_find_xla(rho_dev, labels, is_max)
    kn_p = PE.edge_find(labels, is_max)
    assert int(jnp.sum(kn_x != kn_p)) == 0

    rng = np.random.default_rng(5)
    ed = np.asarray(kn_x) == -2
    kn_mod = jnp.asarray(np.where((rng.random(shape) < 0.5) & ed, -1,
                                  np.asarray(kn_x)).astype(np.int8))
    lab_mod = np.asarray(labels).copy()
    sel = (rng.random(shape) < 0.1) & ed
    lab_mod[sel] = (lab_mod[sel] + 1) % int(lab_mod.max() + 1)
    lab_mod = jnp.asarray(lab_mod)
    ck_x = E._edge_check_xla(kn_mod, rho_dev, lab_mod, is_max)
    ck_p = PE.edge_check(kn_mod, lab_mod, is_max)
    assert int(jnp.sum(ck_x != ck_p)) == 0


def test_resolve_roots_pallas_matches_doubling():
    """Chase-kernel root resolution (the compact-basin secondary backend)
    vs XLA pointer doubling."""
    shape = (96, 64, 128)
    rho_dev, w, _ = _setup(shape, 10, 6, False)
    bk = ongrid_step_codes(rho_dev, w)
    parent = parent_from_step_codes(bk)
    roots_pl = pallas_chase.resolve_roots_pallas(parent, bk)
    roots_xla = resolve_roots(parent)
    assert int(jnp.sum(roots_pl != roots_xla)) == 0
