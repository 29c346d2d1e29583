#!/usr/bin/env python
"""Demonstrates the int-in-f32 bitcast corruption behind the walker's
compaction packing direction (ops/neargrid.py:_compact_state).

The walker compaction packs its whole per-lane state into ONE matrix so a
single row gather moves it.  Two candidate layouts:

  (a) ints bitcast INTO an f32 matrix  -> CORRUPTS on TPU: XLA's f32
      pipeline canonicalises NaN bit patterns (-1 == 0xFFFFFFFF becomes
      0x7FC00000) and flushes denormal-range payloads (ints < 2^23) to
      zero somewhere between the concatenate and the gather;
  (b) f32 dr bitcast INTO an int32 matrix -> exact: integer ops never
      touch the payload bits, and every f32 bit pattern survives a round
      trip through int32 moves.

Run on TPU to see (a) fail and (b) hold; on CPU both hold (the
canonicalisation is a TPU float-pipeline behaviour).

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/packed_compact_bits.py

Single-purpose measurement script; not part of the package.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import _enable_cache
    _enable_cache()
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    k = 1 << 16
    ints = jnp.asarray(
        np.concatenate([
            np.full(16, -1, np.int32),            # NaN bit pattern
            rng.integers(0, 1 << 22, 16).astype(np.int32),  # denormal range
            rng.integers(0, 1 << 30, k - 32).astype(np.int32),
        ]))
    order = jnp.asarray(rng.permutation(k).astype(np.int32))

    @jax.jit
    def via_f32(ints, order):
        f = jax.lax.bitcast_convert_type(ints, jnp.float32)
        mat = jnp.stack([f, f], axis=1)
        sub = jnp.take(mat, order, axis=0)
        return jax.lax.bitcast_convert_type(sub[:, 0], jnp.int32)

    @jax.jit
    def via_i32(ints, order):
        f = jax.lax.bitcast_convert_type(ints, jnp.float32)  # an f32 payload
        i = jax.lax.bitcast_convert_type(f, jnp.int32)
        mat = jnp.stack([i, i], axis=1)
        sub = jnp.take(mat, order, axis=0)
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(sub[:, 0], jnp.float32), jnp.int32)

    want = np.asarray(ints)[np.asarray(order)]
    got_a = np.asarray(via_f32(ints, order))
    got_b = np.asarray(via_i32(ints, order))
    bad_a = int((got_a != want).sum())
    bad_b = int((got_b != want).sum())
    print(f"(a) ints inside f32 matrix: {bad_a}/{k} corrupted "
          f"({'FAILS' if bad_a else 'ok'})")
    if bad_a:
        i = int(np.flatnonzero(got_a != want)[0])
        print(f"    e.g. want 0x{want[i] & 0xFFFFFFFF:08X} "
              f"got 0x{got_a[i] & 0xFFFFFFFF:08X}")
    print(f"(b) f32 inside int32 matrix: {bad_b}/{k} corrupted "
          f"({'FAILS' if bad_b else 'ok — the layout the walker uses'})")


if __name__ == "__main__":
    main()
