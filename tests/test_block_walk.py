"""Tests: in-VMEM block-local walker (ops/block_walk.py).

Contract: enabling the block phase changes WHERE a walk step's operand
row is fetched from, never the trajectory — walk_drain results must be
identical (positions, done flags, and in screened mode the risky set,
since CPU interpret mode evaluates the same f32 ops) with the phase on
or off.  The relayout of q-rows into block-major tables is value-checked
directly.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pybader_tpu import grid as g
from pybader_tpu.ops import block_walk as bw
from pybader_tpu.ops import neargrid as ng
from pybader_tpu.ops.stencil import ongrid_step_codes

SHAPE = (32, 32, 128)  # minimum conforming-ish grid: 2x2x1 blocks
LATTICE = np.array([[6.0, 0.2, 0.0],
                    [0.0, 5.5, 0.3],
                    [0.1, 0.0, 21.0]])


def make_density(seed=0):
    rng = np.random.default_rng(seed)
    nx, ny, nz = SHAPE
    fx = np.arange(nx) / nx
    fy = np.arange(ny) / ny
    fz = np.arange(nz) / nz
    rho = np.full(SHAPE, 0.02)
    for _ in range(14):
        c = rng.random(3)
        wdt = 0.04 + 0.12 * rng.random()
        amp = 0.5 + rng.random()
        dx = np.minimum(np.abs(fx - c[0]), 1 - np.abs(fx - c[0]))
        dy = np.minimum(np.abs(fy - c[1]), 1 - np.abs(fy - c[1]))
        dz = np.minimum(np.abs(fz - c[2]), 1 - np.abs(fz - c[2]))
        r2 = (dx[:, None, None] ** 2 + dy[None, :, None] ** 2
              + dz[None, None, :] ** 2)
        rho += amp * np.exp(-r2 / wdt ** 2)
    return rho


def _fixture(seed=0):
    rho = make_density(seed)
    w = tuple(g.distance_weights(LATTICE, SHAPE))
    tg = g.t_grad(LATTICE, SHAPE)
    bk = ongrid_step_codes(jnp.asarray(rho), w)
    qrows = ng.precompute_qrows(jnp.asarray(rho), bk, jnp.asarray(tg),
                                strict_grad=True)
    n = int(np.prod(SHAPE))
    rng = np.random.default_rng(seed + 100)
    stop = np.zeros(n, dtype=bool)
    stop[rng.choice(n, size=n // 15, replace=False)] = True
    starts = rng.choice(n, size=3000, replace=False).astype(np.int32)
    stop[starts] = False
    q_baked = ng.update_stop_q(qrows, jnp.asarray(stop))
    padded = jnp.asarray(ng.pad_starts(starts))
    return q_baked, padded, tg


def test_build_tables_relayout():
    q_baked, _, _ = _fixture(1)
    qt0, qt1 = bw.build_tables(q_baked, SHAPE)
    q = np.asarray(q_baked)
    t0, t1 = np.asarray(qt0), np.asarray(qt1)
    nx, ny, nz = SHAPE
    nby, nbz = ny // bw.BY, nz // bw.BZ
    rng = np.random.default_rng(3)
    for _ in range(200):
        x, y, z = rng.integers(0, nx), rng.integers(0, ny), \
            rng.integers(0, nz)
        flat = (x * ny + y) * nz + z
        b = ((x // bw.BX) * nby + y // bw.BY) * nbz + z // bw.BZ
        r = (x % bw.BX) * bw.BY + (y % bw.BY)
        c = z % bw.BZ
        assert t0[b, r, c] == q[flat, 0]
        assert t1[b, r, c] == q[flat, 1]


@pytest.mark.parametrize("screened", [False, True])
def test_block_phase_walk_identical(monkeypatch, screened):
    q_baked, padded, tg = _fixture(0)
    kw = dict(shape=SHAPE, strict_grad=True, segments=(2, 2, 4),
              min_batch=64, fields=q_baked, screened=screened)

    monkeypatch.setattr(bw, "_ENABLED", False)
    ref = ng.walk_drain(padded, None, None, None, jnp.asarray(tg), **kw)

    monkeypatch.setattr(bw, "_ENABLED", True)
    monkeypatch.setattr(bw, "_MIN_LANES", 256)
    got = ng.walk_drain(padded, None, None, None, jnp.asarray(tg), **kw)

    names = ("pos", "done", "risky")
    for i, (a, b) in enumerate(zip(ref, got)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), names[i]


def test_block_phase_preserves_lane_order_and_padding(monkeypatch):
    q_baked, padded, tg = _fixture(2)
    state = ng._init_state(padded, jnp.float32, screened=False)
    out, rounds = bw.block_phase(state, q_baked, SHAPE, screened=False,
                                 max_rounds=2)
    assert rounds >= 1
    pad = np.asarray(padded) < 0
    # padding lanes: born done, never moved
    assert np.all(np.asarray(out[4])[pad])
    assert np.all(np.asarray(out[0])[pad] == 0)
    # live lanes advanced in place: every lane's position is a valid voxel
    n = int(np.prod(SHAPE))
    assert np.asarray(out[0]).min() >= 0
    assert np.asarray(out[0]).max() < n
    # lanes marked done sit on stop/max rows (w1 sign bit or code 13)
    w1 = np.asarray(q_baked[:, 1])
    done_pos = np.asarray(out[0])[np.asarray(out[4]) & ~pad]
    codes = (w1[done_pos] >> 25) & 31
    assert np.all((w1[done_pos] < 0) | (codes == 13))


def test_enabled_guards():
    assert not bw.enabled((24, 20, 18), 1 << 20, True)   # non-conforming
    assert not bw.enabled(SHAPE, 1 << 20, False)          # f32 rows
    assert not bw.enabled(SHAPE, 1024, True)              # tiny walk
    if bw._ENABLED:
        assert bw.enabled(SHAPE, 1 << 20, True)
