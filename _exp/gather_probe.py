#!/usr/bin/env python
"""Probe: can anything on v5e beat XLA's random row-gather rate?

The refinement walker's unit cost is one data-dependent (N,4)-f32 row
gather per step (measured ~79M rows/s at 16M lanes — 1.26 GB/s effective,
~0.15% of v5e HBM streaming bandwidth).  This probes whether headroom
exists:

  1. XLA gather rate vs lane count / row width / dtype / index order
     (chained, data-dependent — XLA cannot hoist);
  2. whether Mosaic compiles a VECTORIZED in-VMEM gather
     (jnp.take / take_along_axis on a VMEM-resident table inside a
     pallas kernel), and at what rate — the enabler for a sorted
     streaming-gather walker.

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/gather_probe.py

Single-purpose measurement script; not part of the package.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import _enable_cache
    _enable_cache()
    import jax
    import jax.numpy as jnp
    from functools import partial

    n = 384 ** 3
    rng = np.random.default_rng(0)

    # everything is generated ON DEVICE: a 0.9-5 GB host upload through
    # the tunnel costs minutes (the first probe version hung its budget
    # uploading operands)
    def dev_perm(k, seed=1):
        # pseudo-random indices in [0, n): affine map with odd multiplier
        i = jnp.arange(k, dtype=jnp.uint32)
        return (((i * jnp.uint32(2654435761) + jnp.uint32(seed * 97))
                 % jnp.uint32(n)).astype(jnp.int32))

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        float(jnp.sum(out[0].astype(jnp.float32).reshape(-1)[:1]))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*a)
            float(jnp.sum(out[0].astype(jnp.float32).reshape(-1)[:1])
                  + out[1].astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        return best

    # chained gathers: next index derived from fetched data so steps are
    # data-dependent like the walk
    hop = dev_perm(n, seed=7)

    @partial(jax.jit, static_argnames=("steps", "width"))
    def chain_rows(rows, idx, steps: int, width: int):
        def body(i, carry):
            idx, acc = carry
            r = jnp.take(rows, idx, axis=0)
            nxt = r[:, width - 1].astype(jnp.int32) & (n - 1) \
                if False else jnp.take(hop, idx)
            return nxt, acc + r[:, 0].astype(jnp.float32)
        idx, acc = jax.lax.fori_loop(0, steps, body, (idx, jnp.zeros(
            idx.shape[0], jnp.float32)))
        return acc, jnp.sum(idx.astype(jnp.float32) * 0)

    steps = 8
    for k_lanes in (1 << 20, 1 << 23):
        idx0 = dev_perm(k_lanes, seed=3)
        for width, dt in ((4, jnp.float32), (2, jnp.float32),
                          (4, jnp.int32), (8, jnp.float32)):
            base = jnp.arange(n, dtype=jnp.int32)[:, None] * 7 \
                + jnp.arange(width, dtype=jnp.int32)[None, :]
            rows = (base.astype(jnp.float32) * 1e-6
                    if dt == jnp.float32 else base)
            del base
            dtb = timed(chain_rows, rows, idx0, steps, width)
            rate = k_lanes * steps / dtb
            print(f"XLA chained gather (N,{width}) "
                  f"{np.dtype(dt.dtype if hasattr(dt, 'dtype') else dt).name}"
                  f" lanes={k_lanes >> 20}M: {rate / 1e6:.1f} M rows/s "
                  f"({rate * width * 4 / 1e9:.2f} GB/s)", flush=True)
            del rows

    # sortedness effect: hop table that keeps indices near-sorted
    rows = (jnp.arange(n, dtype=jnp.int32)[:, None]
            + jnp.arange(4, dtype=jnp.int32)[None, :]
            ).astype(jnp.float32) * 1e-6
    idx_sorted = jnp.sort(dev_perm(1 << 23, seed=5))
    i = jnp.arange(n, dtype=jnp.int32)
    hop_local = jnp.remainder(i + (dev_perm(n, seed=9) % 800) - 400, n)

    @partial(jax.jit, static_argnames=("steps",))
    def chain_local(rows, idx, steps: int):
        def body(i, carry):
            idx, acc = carry
            r = jnp.take(rows, idx, axis=0)
            return jnp.take(hop_local, idx), acc + r[:, 0]
        idx, acc = jax.lax.fori_loop(
            0, steps, body, (idx, jnp.zeros(idx.shape[0], jnp.float32)))
        return acc, jnp.sum(idx.astype(jnp.float32) * 0)

    dtb = timed(chain_local, rows, idx_sorted, 8)
    rate = (1 << 23) * 8 / dtb
    print(f"XLA chained gather (N,4) f32 8M lanes SORTED/local-hop: "
          f"{rate / 1e6:.1f} M rows/s", flush=True)

    # ---- Mosaic in-VMEM vectorized gather probe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, L = 2048, 4096  # table rows in VMEM, lanes per block

    def probe(form, kernel):
        try:
            table = jnp.asarray(rng.random((T, 128)), jnp.float32)
            idx = jnp.asarray(rng.integers(0, T, size=L), jnp.int32)
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((L, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(idx, table)
            jax.block_until_ready(out)
            # correctness
            exp = np.asarray(table)[np.asarray(idx)]
            ok = np.allclose(np.asarray(out), exp)
            t0 = time.perf_counter()
            for _ in range(10):
                out = pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((L, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(idx, table)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 10
            print(f"MOSAIC {form}: OK correct={ok} "
                  f"{L / dt / 1e6:.1f} M rows/s (in-VMEM)", flush=True)
        except Exception as e:
            print(f"MOSAIC {form}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    def k_take(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    def k_tala(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(
            table_ref[:], idx_ref[:][:, None], axis=0)

    def k_onehot(idx_ref, table_ref, out_ref):
        oh = (idx_ref[:][:, None]
              == jax.lax.broadcasted_iota(jnp.int32, (L, T), 1))
        out_ref[:] = jnp.dot(oh.astype(jnp.float32), table_ref[:],
                             preferred_element_type=jnp.float32)

    probe("take(axis=0)", k_take)
    probe("take_along_axis", k_tala)
    probe("onehot-matmul", k_onehot)


if __name__ == "__main__":
    main()
