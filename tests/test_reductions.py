"""Unit tests for the reduction/remap utilities (CPU-portable jnp code)."""
import numpy as np
import jax.numpy as jnp

from pybader_tpu.ops import reductions


def test_masked_min_pair_matches_numpy():
    rng = np.random.default_rng(0)
    n, k = 10000, 23
    labels = jnp.asarray(rng.integers(0, k, n), dtype=jnp.int32)
    values = jnp.asarray(rng.integers(0, 1 << 20, n), dtype=jnp.int32)
    mask = jnp.asarray(rng.random(n) < 0.3)
    mins, mmins = reductions.masked_min_pair(values, labels, mask, k)
    lab, val, m = np.asarray(labels), np.asarray(values), np.asarray(mask)
    big = np.iinfo(np.int32).max
    np.testing.assert_array_equal(
        np.asarray(mins), [val[lab == i].min() for i in range(k)])
    expect = np.array([
        val[(lab == i) & m].min() if ((lab == i) & m).any() else big
        for i in range(k)
    ])
    np.testing.assert_array_equal(np.asarray(mmins), expect)


def test_masked_min_pair_odd_length():
    rng = np.random.default_rng(1)
    n, k = 8001, 7  # odd: exercises the cols=1 degenerate reshape
    labels = jnp.asarray(rng.integers(0, k, n), dtype=jnp.int32)
    values = jnp.asarray(rng.integers(0, 1 << 20, n), dtype=jnp.int32)
    mask = jnp.asarray(rng.random(n) < 0.3)
    mins, _ = reductions.masked_min_pair(values, labels, mask, k)
    lab, val = np.asarray(labels), np.asarray(values)
    np.testing.assert_array_equal(
        np.asarray(mins), [val[lab == i].min() for i in range(k)])


def test_remap_sweep():
    rng = np.random.default_rng(2)
    n, k = 9000, 19
    labels = np.where(
        rng.random(n) < 0.1, -1, rng.integers(0, k, n)
    ).astype(np.int32)
    table = rng.permutation(k).astype(np.int32)
    out = np.asarray(
        reductions.remap_sweep(jnp.asarray(labels), jnp.asarray(table), k)
    )
    expect = np.where(labels < 0, labels, table[np.clip(labels, 0, None)])
    np.testing.assert_array_equal(out, expect)


def test_compact_indices():
    rng = np.random.default_rng(3)
    mask = rng.random(5000) < 0.05
    idx = np.asarray(reductions.compact_indices(jnp.asarray(mask), 512))
    expect = np.flatnonzero(mask)
    assert len(expect) <= 512
    np.testing.assert_array_equal(idx[: len(expect)], expect)
    assert (idx[len(expect):] == -1).all()


def test_charge_volume_sum_masked_vs_segment_path():
    """The masked-sweep fast path and segment_sum agree exactly."""
    rng = np.random.default_rng(4)
    n = 1 << 22  # at the fast-path size threshold
    labels = jnp.asarray(rng.integers(-1, 12, n), dtype=jnp.int32)
    density = jnp.asarray(rng.random(n))
    c_fast, v_fast = reductions.charge_volume_sum(density, labels, 0.5, 12)
    # force the segment path by disguising the size
    lab2 = labels[: n - 1]
    den2 = density[: n - 1]
    c_seg, v_seg = reductions.charge_volume_sum(den2, lab2, 0.5, 12)
    # compare on the common prefix via numpy recompute
    lab_h, den_h = np.asarray(labels), np.asarray(density)
    expect_c = np.array(
        [den_h[lab_h == i].sum() * 0.5 for i in range(12)]
    )
    np.testing.assert_allclose(np.asarray(c_fast), expect_c, rtol=1e-12)
    expect_v = np.array([(lab_h == i).sum() * 0.5 for i in range(12)])
    np.testing.assert_allclose(np.asarray(v_fast), expect_v, rtol=1e-12)
