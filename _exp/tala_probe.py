#!/usr/bin/env python
"""Probe: two-stage Mosaic dynamic_gather as an in-VMEM walk engine.

``_exp/pallas_gather_probe.py`` found Mosaic rejects 1-D ``jnp.take``
with "Only 2D gather is supported" — i.e. the hardware DOES expose a 2-D
``dynamic_gather`` (``take_along_axis`` with idx shape == table shape):

    axis=0:  out[i, j] = table[idx[i, j], j]   (per-lane sublane select)
    axis=1:  out[i, j] = table[i, idx[i, j]]   (per-lane lane shuffle)

An arbitrary (row, col) fetch per lane composes the two: first shuffle
every table row to put column ``c_j`` into lane ``j`` (axis=1 with idx
broadcast over rows), then select row ``r_j`` per lane (axis=0).  Each
stage touches the whole (BH,128) table per 128 lanes but runs at VPU
rates with zero HBM traffic — if it beats the ~91M lane-steps/s HBM
gather ceiling (BASELINE.md "Walker cost model") by a wide margin, a
block-local walker that drains short trajectories inside VMEM becomes
the remaining perf lever.

Variants (all index-dependent chains, value-checked vs a host replay):
    tala0      axis=0 only (row select, col fixed = lane id)
    tala2      full two-stage (row, col) fetch
    tala2x8    two-stage over an (8,128) lane tile (8 sublane groups)

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/tala_probe.py
    python _exp/tala_probe.py --interpret      # CPU value check

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
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--tiles", type=int, default=256)
    ap.add_argument("--bh", type=int, default=256,
                    help="table rows; table = (bh, 128), block = bh*128 "
                         "voxels (256 -> 32^3)")
    args = ap.parse_args()

    if args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from bench import _enable_cache, _sync_scalar

    _enable_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BH = args.bh
    B = BH * 128
    steps = args.steps
    tiles = args.tiles
    rng = np.random.default_rng(0)
    tbl_host = rng.integers(0, B, size=(BH, 128)).astype(np.int32)
    idx_host = rng.integers(0, B, size=(tiles, 8, 128)).astype(np.int32)

    def run_one(name, kernel, lane_shape):
        tbl = jnp.asarray(tbl_host)
        idx = jnp.asarray(idx_host[:, : lane_shape[0]])

        f = pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((BH, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + lane_shape, lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1,) + lane_shape, lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tiles,) + lane_shape,
                                           jnp.int32),
            interpret=args.interpret,
        )
        fj = jax.jit(f)
        with jax.enable_x64(False):
            out = fj(tbl, idx)
            _sync_scalar(out)
            t0 = time.perf_counter()
            reps = 1 if args.interpret else 5
            for _ in range(reps):
                out = fj(tbl, idx)
            _sync_scalar(out)
            dt = (time.perf_counter() - t0) / reps
        lanes = tiles * lane_shape[0] * lane_shape[1]
        print(f"  {name:8s}: {dt*1e3:8.2f} ms  "
              f"{lanes*steps/dt/1e6:8.1f} M lane-steps/s", flush=True)
        return np.asarray(out)

    # ---- axis=0 only: next = tbl[pos >> 7, lane]  ------------------------
    def k_tala0(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]

        def body(_, pos):
            rb = jnp.broadcast_to(pos >> 7, (BH, 128))
            sel = jnp.take_along_axis(tbl, rb, axis=0)
            return sel[:1] % B

        out_ref[0] = jax.lax.fori_loop(0, steps, body, idx_ref[0, :1])

    def host0():
        pos = idx_host[:, :1].copy()
        for _ in range(steps):
            pos = tbl_host[pos >> 7, np.arange(128)[None, :]] % B
        return pos

    # ---- two-stage: next = tbl[pos >> 7, pos & 127]  ---------------------
    def fetch2(tbl, pos):  # pos: (1,128)
        cb = jnp.broadcast_to(pos & 127, (BH, 128))
        shuf = jnp.take_along_axis(tbl, cb, axis=1)   # shuf[i,j]=tbl[i,c_j]
        rb = jnp.broadcast_to(pos >> 7, (BH, 128))
        sel = jnp.take_along_axis(shuf, rb, axis=0)   # sel[i,j]=tbl[r_j,c_j]
        return sel[:1]

    def k_tala2(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]

        def body(_, pos):
            return fetch2(tbl, pos) % B

        out_ref[0] = jax.lax.fori_loop(0, steps, body, idx_ref[0, :1])

    def k_tala2x8(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]

        def body(_, pos):  # pos: (8,128)
            nxt = [fetch2(tbl, pos[s:s + 1]) for s in range(8)]
            return jnp.concatenate(nxt, axis=0) % B

        out_ref[0] = jax.lax.fori_loop(0, steps, body, idx_ref[0])

    def host2(rows):
        pos = idx_host[:, :rows].copy()
        for _ in range(steps):
            pos = tbl_host[pos >> 7, pos & 127] % B
        return pos

    for name, kern, lane_shape, ref in (
        ("tala0", k_tala0, (1, 128), host0),
        ("tala2", k_tala2, (1, 128), lambda: host2(1)),
        ("tala2x8", k_tala2x8, (8, 128), lambda: host2(8)),
    ):
        try:
            out = run_one(name, kern, lane_shape)
            ok = np.array_equal(out, ref())
            print(f"            values {'MATCH' if ok else 'MISMATCH'}")
        except Exception as e:
            print(f"  {name:8s}: FAILED — {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
