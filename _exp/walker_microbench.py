#!/usr/bin/env python
"""Gather-rate microbench grounding the walker row layout (BASELINE.md).

Measures on-device rates for the access patterns the refinement walker
chooses between:

  - (N,4) row gathers at f32 vs f64 (the walker's unit cost);
  - single-element f64 gathers (the naive 9-gather step baseline);
  - the same gathers with ascending (position-sorted) vs random indices
    (grounds the PYBADER_TPU_SORT_COMPACT default).

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/walker_microbench.py \
        [--grid 384] [--lanes 16777216]

Single-purpose measurement script; not part of the package.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, sync, reps=3):
    fn()  # warm / compile
    sync()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        sync_val = fn()
        sync()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=384)
    ap.add_argument("--lanes", type=int, default=1 << 24)
    ap.add_argument("--steps", type=int, default=8,
                    help="chained gathers per timed program")
    args = ap.parse_args()

    from bench import _enable_cache, _sync_scalar
    _enable_cache()
    import jax
    import jax.numpy as jnp

    n = args.grid ** 3
    k = args.lanes
    steps = args.steps
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, n, size=k), jnp.int32)
    idx_sorted = jnp.sort(idx0)
    # chained next-hop table so successive gathers are data-dependent like
    # the real walk (a static index vector would let XLA hoist everything)
    nxt = jnp.asarray(rng.integers(0, n, size=n), jnp.int32)

    def chained(rows):
        @jax.jit
        def run(idx):
            def body(i, carry):
                idx, acc = carry
                row = jnp.take(rows, idx, axis=0, mode="clip")
                if row.ndim == 2:
                    acc = acc + jnp.sum(row[:, :1])
                    idx = jnp.take(nxt, idx, mode="clip")
                else:
                    acc = acc + jnp.sum(row[:1])
                    idx = jnp.take(nxt, idx, mode="clip")
                return idx, acc
            idx, acc = jax.lax.fori_loop(0, steps, body, (idx, 0.0))
            return acc

        return run

    results = {}
    for name, rows in (
        ("f32x4 rows", jnp.zeros((n, 4), jnp.float32)),
        ("f64x4 rows", jnp.zeros((n, 4), jnp.float64)),
        ("f64 elements", jnp.zeros((n,), jnp.float64)),
    ):
        run = chained(rows)
        for order, idx in (("random", idx0), ("sorted", idx_sorted)):
            dt = timeit(lambda: run(idx), lambda: _sync_scalar(idx[:8]))
            rate = k * steps / dt
            results[(name, order)] = rate
            print(f"{name:14s} {order:7s}: {dt:7.3f}s for "
                  f"{k * steps / 1e6:.0f}M lane-steps = "
                  f"{rate / 1e6:6.1f}M rows/s")
    rnd = results.get(("f32x4 rows", "random"))
    srt = results.get(("f32x4 rows", "sorted"))
    if rnd and srt:
        print(f"\nsorted/random f32-row ratio: {srt / rnd:.2f}x "
              f"(PYBADER_TPU_SORT_COMPACT pays only if >> 1 after the "
              f"sort's own cost)")


if __name__ == "__main__":
    main()
