#!/usr/bin/env python
"""Does an 8-byte (N,2) i32 row gather run ~2x the 16-byte (N,4) f32 row?

BASELINE.md records the row gather as BYTE-bound (~1.26 GB/s effective
whatever the layout: f64x4 39M rows/s vs f32x4 79M rows/s at 16M lanes).
If that extends down to 8-byte rows, a quantised walker row (int16
fixed-point gradient + ongrid step code + flags packed into two i32
words) doubles the refinement walk rate.  This probe measures the
chained-gather rate for both layouts at refinement-class lane counts.

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/qrow_probe.py [--grid 384]

Single-purpose measurement script; not part of the package.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=384)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from bench import _enable_cache, _sync_scalar
    _enable_cache()
    import jax
    import jax.numpy as jnp

    n = args.grid ** 3
    steps = args.steps
    rng = np.random.default_rng(0)
    nxt = jnp.asarray(rng.integers(0, n, size=n), jnp.int32)

    def chained(rows):
        @jax.jit
        def run(idx):
            def body(i, carry):
                idx, acc = carry
                row = jnp.take(rows, idx, axis=0, mode="clip")
                acc = acc + jnp.sum(row[:1, :1]).astype(jnp.float32)
                idx = jnp.take(nxt, idx, mode="clip")
                return idx, acc
            idx, acc = jax.lax.fori_loop(
                0, steps, body, (idx, jnp.zeros((), jnp.float32)))
            return acc
        return run

    layouts = (
        ("f32x4 (16B)", jnp.zeros((n, 4), jnp.float32)),
        ("i32x2 ( 8B)", jnp.zeros((n, 2), jnp.int32)),
        ("i32x1 ( 4B)", jnp.zeros((n, 1), jnp.int32)),
    )
    import sys as _sys
    lane_list = [int(x) for x in (_sys.argv[1:] if False else [])] or \
        [1 << 21, 1 << 23]
    env_lanes = os.environ.get("QROW_LANES")
    if env_lanes:
        lane_list = [1 << int(x) for x in env_lanes.split(",")]
    for k in lane_list:
        idx0 = jnp.asarray(rng.integers(0, n, size=k), jnp.int32)
        for name, rows in layouts:
            run = chained(rows)
            run(idx0)
            _sync_scalar(idx0[:8])
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                run(idx0)
                _sync_scalar(idx0[:8])
                best = min(best, time.perf_counter() - t0)
            rate = k * steps / best
            print(f"lanes {k >> 20:2d}M  {name}: {best:6.3f}s = "
                  f"{rate / 1e6:6.1f}M rows/s "
                  f"({rate * rows.shape[1] * rows.dtype.itemsize / 1e9:5.2f}"
                  f" GB/s)", flush=True)


if __name__ == "__main__":
    main()
