#!/usr/bin/env python
"""Do independent chained gathers overlap on v5e?

_exp/qrow_probe.py measured a flat ~37M rows/s for ONE dependent row
gather per step, independent of lane count (2M-16M) and row bytes
(16B/8B/4B) — i.e. the walk is bound by the serialized dependent-gather
chain, not by bytes.  If XLA overlaps INDEPENDENT gather ops, stepping C
independent sub-buckets inside one loop body multiplies walker
throughput by up to C.  This probe times C = 1/2/4/8 chains at constant
total lanes.

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/chain_probe.py [--grid 384]

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
    ap.add_argument("--lanes", type=int, default=1 << 22)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from bench import _enable_cache, _sync_scalar
    _enable_cache()
    import jax
    import jax.numpy as jnp

    n = args.grid ** 3
    k_total = args.lanes
    steps = args.steps
    rng = np.random.default_rng(0)
    rows = jnp.zeros((n, 2), jnp.int32)

    def make_run(chains):
        # per-chain next-hop derived from the gathered row word0 (a
        # dependent chain XLA cannot hoist); chains share the table but
        # carry independent index vectors
        @jax.jit
        def run(idxs):
            def body(i, carry):
                idxs, acc = carry
                new = []
                for idx in idxs:
                    row = jnp.take(rows, idx, axis=0, mode="clip")
                    # row is all zeros: nxt = (idx*2654435761+w0) % n keeps
                    # the chain dependent on the gather result
                    nxt = jnp.remainder(
                        idx * np.int32(-1640531527) + row[:, 0],
                        np.int32(n))
                    acc = acc + jnp.sum(row[:1, :1]).astype(jnp.float32)
                    new.append(nxt)
                return tuple(new), acc
            idxs, acc = jax.lax.fori_loop(
                0, steps, body, (idxs, jnp.zeros((), jnp.float32)))
            return acc
        return run

    for chains in (1, 2, 4, 8):
        k = k_total // chains
        idxs = tuple(
            jnp.asarray(rng.integers(0, n, size=k), jnp.int32)
            for _ in range(chains))
        run = make_run(chains)
        run(idxs)
        _sync_scalar(idxs[0][:8])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            run(idxs)
            _sync_scalar(idxs[0][:8])
            best = min(best, time.perf_counter() - t0)
        rate = k_total * steps / best
        print(f"chains {chains}  ({k >> 20}M lanes each): {best:6.3f}s = "
              f"{rate / 1e6:6.1f}M total lane-steps/s", flush=True)


if __name__ == "__main__":
    main()
