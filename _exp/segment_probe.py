#!/usr/bin/env python
"""Attribute the walker-body cost: actual segment fns vs the 91M/s chain.

_exp/chain_probe.py measured a single dependent row-gather chain at
~91M lane-steps/s on v5e (flat in chain count and width), while the
real refinement walk ran at ~39M effective bucket lane-steps/s.  This
probe times the ACTUAL segment functions (_walk_segment_counted_q /
_qs / _packed) at a fixed lane count and step count with no lane ever
finishing, next to ablated variants of the q body, to find where the
2.3x goes:

  full-q      the shipping _walk_segment_counted_q
  full-qs     the screened variant (err/risky tracking)
  no-hist     revisit window dropped to prev only
  xyz-carry   xyz carried in state (no unflat div/mod per step)
  bare        gather + next-pos arithmetic only (chain-probe body shape)

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/segment_probe.py \
        [--grid 384] [--lanes 22] [--steps 32]

Single-purpose measurement script; not part of the package.
"""
import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=384)
    ap.add_argument("--lanes", type=int, default=22, help="log2 lanes")
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    from bench import _enable_cache, _sync_scalar
    _enable_cache()
    import jax
    import jax.numpy as jnp
    from pybader_tpu.ops import neargrid as ng

    nx = ny = nz = args.grid
    shape = (nx, ny, nz)
    n = nx * ny * nz
    k = 1 << args.lanes
    steps = args.steps
    rng = np.random.default_rng(0)

    # qrows with NO max/stop/ongrid bits: every lane takes the gradient
    # path every step and never finishes — steady-state stepping rate.
    # (19-bit layout, mirrors ng._pack_qwords)
    q = rng.integers(-260000, 260000, size=(n, 3)).astype(np.int32)
    code = rng.integers(0, 27, size=n).astype(np.int32)
    code = np.where(code == 13, 12, code)
    word0 = (q[:, 0] & 0x7FFFF) | ((q[:, 1] & 0x1FFF) << 19)
    word1 = ((q[:, 1] & 0x7FFFF) >> 13) | ((q[:, 2] & 0x7FFFF) << 6) \
        | (code << 25)
    qrows = jnp.asarray(np.stack([word0, word1], axis=1))

    starts = jnp.asarray(rng.integers(0, n, size=k), jnp.int32)

    def timeit(fn, *a, reps=3):
        out = fn(*a)
        _sync_scalar(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            _sync_scalar(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    # ---- shipping segment functions -------------------------------------
    st_q = ng._init_state(starts, jnp.float32)
    t = timeit(lambda: ng._walk_segment_counted_q(
        st_q, qrows, shape, steps, early_exit=False))
    print(f"full-q    : {t:6.3f}s = {k * steps / t / 1e6:6.1f}M lane-steps/s",
          flush=True)

    st_qs = ng._init_state(starts, jnp.float32, screened=True)
    t = timeit(lambda: ng._walk_segment_counted_qs(
        st_qs, qrows, shape, steps, early_exit=False))
    print(f"full-qs   : {t:6.3f}s = {k * steps / t / 1e6:6.1f}M lane-steps/s",
          flush=True)

    # ---- ablations -------------------------------------------------------
    dims = jnp.asarray([nx, ny, nz], jnp.int32)

    def flat(xyz):
        return (xyz[..., 0] * ny + xyz[..., 1]) * nz + xyz[..., 2]

    def unflat(p):
        return jnp.stack([p // (ny * nz), (p // nz) % ny, p % nz], axis=-1)

    def fetch(qrows, pos):
        row = jnp.take(qrows, pos, axis=0, mode="clip")
        w0, w1 = row[:, 0], row[:, 1]
        g = jnp.stack(ng._q_decode(w0, w1), axis=-1).astype(
            jnp.float32) * jnp.float32(1.0 / ng._Q_SCALE)
        code = (w1 >> ng._Q_CODE_SHIFT) & ng._CODE_MASK
        return g, code

    @partial(jax.jit, static_argnames=())
    def seg_nohist(qrows, pos, prev, dr):
        def body(i, carry):
            pos, prev, dr = carry
            g, code = fetch(qrows, pos)
            xyz = unflat(pos)
            og_off = jnp.stack(
                [code // 9 - 1, (code // 3) % 3 - 1, code % 3 - 1], axis=-1)
            ongrid_next = flat(jnp.remainder(xyz + og_off, dims))
            int_grad = ng._round_away(g)
            dr_new = dr + g - int_grad
            int_dr = ng._round_away(dr_new)
            dr_after = dr_new - int_dr
            nxt = flat(jnp.remainder(xyz + int_grad + int_dr, dims))
            revisit = (nxt == pos) | (nxt == prev)
            nxt = jnp.where(revisit, ongrid_next, nxt)
            dr_after = jnp.where(revisit[:, None], 0.0, dr_after)
            return nxt, pos, dr_after
        return jax.lax.fori_loop(0, steps, body, (pos, prev, dr))

    prev0 = jnp.full_like(starts, -1)
    dr0 = jnp.zeros((k, 3), jnp.float32)
    t = timeit(lambda: seg_nohist(qrows, starts, prev0, dr0))
    print(f"no-hist   : {t:6.3f}s = {k * steps / t / 1e6:6.1f}M lane-steps/s",
          flush=True)

    @partial(jax.jit, static_argnames=())
    def seg_xyz(qrows, xyz, prevf, dr):
        # carry xyz; no unflat per step
        def body(i, carry):
            xyz, prevf, dr = carry
            pos = flat(xyz)
            g, code = fetch(qrows, pos)
            og_off = jnp.stack(
                [code // 9 - 1, (code // 3) % 3 - 1, code % 3 - 1], axis=-1)
            int_grad = ng._round_away(g)
            dr_new = dr + g - int_grad
            int_dr = ng._round_away(dr_new)
            dr_after = dr_new - int_dr
            nxt_xyz = jnp.remainder(xyz + int_grad + int_dr, dims)
            og_xyz = jnp.remainder(xyz + og_off, dims)
            nxt = flat(nxt_xyz)
            revisit = (nxt == pos) | (nxt == prevf)
            nxt_xyz = jnp.where(revisit[:, None], og_xyz, nxt_xyz)
            dr_after = jnp.where(revisit[:, None], 0.0, dr_after)
            return nxt_xyz, pos, dr_after
        return jax.lax.fori_loop(0, steps, body, (xyz, prevf, dr))

    xyz0 = jnp.stack([starts // (ny * nz), (starts // nz) % ny,
                      starts % nz], axis=-1)
    t = timeit(lambda: seg_xyz(qrows, xyz0, prev0, dr0))
    print(f"xyz-carry : {t:6.3f}s = {k * steps / t / 1e6:6.1f}M lane-steps/s",
          flush=True)

    @partial(jax.jit, static_argnames=())
    def seg_bare(qrows, pos):
        # chain-probe-shaped body on the same table
        def body(i, carry):
            pos, acc = carry
            row = jnp.take(qrows, pos, axis=0, mode="clip")
            nxt = jnp.remainder(
                pos * np.int32(-1640531527) + row[:, 0], np.int32(n))
            acc = acc + jnp.sum(row[:1, :1]).astype(jnp.float32)
            return nxt, acc
        return jax.lax.fori_loop(0, steps, body,
                                 (pos, jnp.zeros((), jnp.float32)))

    t = timeit(lambda: seg_bare(qrows, starts))
    print(f"bare      : {t:6.3f}s = {k * steps / t / 1e6:6.1f}M lane-steps/s",
          flush=True)


if __name__ == "__main__":
    main()
