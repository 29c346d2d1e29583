#!/usr/bin/env python
"""Can a Pallas kernel beat XLA's ~40-90M rows/s walker gather in VMEM?

The refinement walker is bound by one dependent row gather per step
(BASELINE.md "Walker cost model").  XLA's TPU gather costs ~25 ns/row
whatever the layout; but a walk step only ever needs the row at the
lane's CURRENT position, and trajectories move <= 2 voxels/step — so a
block-local walker could keep a 32^3 q-row block (256 KB) in VMEM and
step many times per HBM visit IF an in-VMEM gather is fast.  This probe
measures a dependent gather chain inside one kernel for the candidate
mechanisms:

  take-1d      jnp.take on a flat (32768,) VMEM table (does Mosaic lower
               a vector gather at all, and at what rate?)
  take-2d      jnp.take axis=0 rows of a (256,128)-shaped table
  onehot-mm    two-stage one-hot: (128,256) f32 one-hot @ (256,128)
               table rows on the MXU, then a masked lane reduce —
               guaranteed to compile (compares + matmuls only)

Each variant runs TILE=(8,128)=1024 lanes x STEPS in-kernel dependent
steps x GRID independent tiles, timed over the whole pallas_call.  The
chain is index-dependent (next index derived from the gathered value),
so steps serialize exactly like the real walk.

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/pallas_gather_probe.py
    python _exp/pallas_gather_probe.py --interpret   # CPU check

Single-purpose measurement script; not part of the package.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 32768  # block voxels (32^3); --block 4096 probes the 16^3 design point
BH, BW = 256, 128  # table layout


def main():
    global B, BH, BW
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--tiles", type=int, default=256)
    ap.add_argument("--block", type=int, default=32768,
                    help="in-VMEM table rows (one-hot cost is linear in "
                         "this: 32768 = 32^3 block, 4096 = 16^3)")
    args = ap.parse_args()
    B = args.block
    BH, BW = B // 128, 128

    if args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from bench import _enable_cache, _sync_scalar

    _enable_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps = args.steps
    tiles = args.tiles
    rng = np.random.default_rng(0)
    # table of "next pointers" so the chain is index-dependent
    tbl_host = rng.integers(0, B, size=B).astype(np.int32)
    idx_host = rng.integers(0, B, size=(tiles, 8, 128)).astype(np.int32)

    def run_one(name, kernel, tbl_shape, interpret):
        tbl = jnp.asarray(tbl_host.reshape(tbl_shape))
        idx = jnp.asarray(idx_host)

        f = pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec(tbl_shape, lambda i: (0,) * len(tbl_shape),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tiles, 8, 128), jnp.int32),
            interpret=interpret,
        )
        fj = jax.jit(f)
        with jax.enable_x64(False):
            out = fj(tbl, idx)
            _sync_scalar(out)
            t0 = time.perf_counter()
            reps = 1 if interpret else 5
            for _ in range(reps):
                out = fj(tbl, idx)
            _sync_scalar(out)
            dt = (time.perf_counter() - t0) / reps
        lane_steps = tiles * 1024 * steps
        print(f"  {name:10s}: {dt*1e3:8.2f} ms  "
              f"{lane_steps/dt/1e6:8.1f} M lane-steps/s", flush=True)
        return np.asarray(out)

    # ---- variant kernels ------------------------------------------------
    def k_take1d(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]

        def body(_, idx):
            nxt = jnp.take(tbl, idx, axis=0, mode="clip")
            return (nxt + 1) % B

        out_ref[0] = jax.lax.fori_loop(0, steps, body, idx_ref[0])

    def k_take2d(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]

        def body(_, idx):
            rows = jnp.take(tbl, idx >> 7, axis=0, mode="clip")  # ???
            # rows would be (8,128,128); select col — only meaningful if
            # take itself compiles; value check is vs the 1d variant
            col = jax.nn.one_hot(idx & 127, BW, dtype=jnp.float32)
            val = jnp.sum(rows.astype(jnp.float32) * col, axis=-1)
            return (val.astype(jnp.int32) + 1) % B

        out_ref[0] = jax.lax.fori_loop(0, steps, body, idx_ref[0])

    def k_onehot(tbl_ref, idx_ref, out_ref):
        # table rows as f32 halves (exact for 16-bit pieces)
        tbl = tbl_ref[:]
        t_hi = (tbl >> 15).astype(jnp.float32)          # (256,128)
        t_lo = (tbl & 0x7FFF).astype(jnp.float32)       # (256,128)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (128, BH), 1)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (128, BW), 1)

        def gather(idx_t):  # idx_t: (128, 8) transposed lane tile
            outs = []
            for s in range(8):
                col = idx_t[:, s:s + 1]                 # (128,1)
                oh = (col >> 7 == iota_h).astype(jnp.float32)  # (128,256)
                r_hi = jnp.dot(oh, t_hi,
                               preferred_element_type=jnp.float32)
                r_lo = jnp.dot(oh, t_lo,
                               preferred_element_type=jnp.float32)
                sel = ((col & 127) == iota_w)
                v = (jnp.sum(jnp.where(sel, r_hi, 0.0), axis=1,
                             keepdims=True).astype(jnp.int32) << 15) | \
                    jnp.sum(jnp.where(sel, r_lo, 0.0), axis=1,
                            keepdims=True).astype(jnp.int32)
                outs.append(v)                           # (128,1)
            return jnp.concatenate(outs, axis=1)        # (128,8)

        def body(_, idx):
            idx_t = idx.T                                # (128,8)
            nxt = gather(idx_t).T                        # (8,128)
            return (nxt + 1) % B

        out_ref[0] = jax.lax.fori_loop(0, steps, body, idx_ref[0])

    # ---- reference chain on host ----------------------------------------
    def host_chain():
        idx = idx_host.copy()
        for _ in range(steps):
            idx = (tbl_host[idx] + 1) % B
        return idx

    ref = host_chain()
    for name, kern, shape in (
        ("take-1d", k_take1d, (B,)),
        ("onehot-mm", k_onehot, (BH, BW)),
    ):
        try:
            out = run_one(name, kern, shape, args.interpret)
            ok = np.array_equal(out, ref)
            print(f"             values {'MATCH' if ok else 'MISMATCH'}")
        except Exception as e:
            print(f"  {name:10s}: FAILED — {type(e).__name__}: "
                  f"{str(e)[:200]}")

    # XLA baseline at the same scale for comparison
    tbl = jnp.asarray(tbl_host)
    idx = jnp.asarray(idx_host.reshape(-1))

    @jax.jit
    def xla_chain(idx):
        def body(_, idx):
            return (jnp.take(tbl, idx, mode="clip") + 1) % B
        return jax.lax.fori_loop(0, steps, body, idx)

    with jax.enable_x64(False):
        out = xla_chain(idx)
        _sync_scalar(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = xla_chain(idx)
        _sync_scalar(out)
        dt = (time.perf_counter() - t0) / 5
    print(f"  xla-take  : {dt*1e3:8.2f} ms  "
          f"{tiles*1024*steps/dt/1e6:8.1f} M lane-steps/s "
          f"({'MATCH' if np.array_equal(np.asarray(out).reshape(ref.shape), ref) else 'MISMATCH'})")


if __name__ == "__main__":
    main()
