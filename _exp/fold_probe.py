#!/usr/bin/env python
"""Probe: composed in-VMEM (row, col) fetch for a block-local walker.

Mosaic's ``tpu.dynamic_gather`` only handles a SINGLE source vreg along
the gather dimension (measured: "Multiple source vregs along gather
dimension" for a (256,128) axis-0 gather).  The supported primitives
are therefore

    sublane-select:  take_along_axis((8,128), idx, axis=0)   1 vreg
    lane-shuffle:    take_along_axis((X,128), idx, axis=1)   any X?

An arbitrary tbl[r_j, c_j] per lane j composes as a binary FOLD on the
row bits (static half-slices + per-lane where, log2(BH/8) stages down
to (8,128)), one sublane-select on r&7, then one lane-shuffle on c:

    fold 256->128->64->32->16->8 rows:  16+8+4+2+1 = 31 vreg selects
    sublane gather + lane shuffle:                     2 ops
    per 128 lane-steps and 4-byte word:               ~33 vreg ops

vs the HBM dependent-gather ceiling of ~91M lane-steps/s (BASELINE.md
"Walker cost model").  This probe times the full dependent chain —
fetch two i32 words (the q-row format), derive the next index from the
fetched value — for BH = 256 (32^3-voxel block) and BH = 32 (16^3), on
(1,128) and (8,128) lane tiles.

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/fold_probe.py
    python _exp/fold_probe.py --interpret      # CPU value check

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

    steps = args.steps
    tiles = args.tiles
    rng = np.random.default_rng(0)

    def make_case(bh):
        b = bh * 128
        t0 = rng.integers(0, b, size=(bh, 128)).astype(np.int32)
        t1 = rng.integers(0, b, size=(bh, 128)).astype(np.int32)
        idx = rng.integers(0, b, size=(tiles, 8, 128)).astype(np.int32)
        return b, t0, t1, idx

    def fold_fetch(tbl, pos, bh):
        """tbl: (bh,128) i32; pos: (1,128) flat in [0, bh*128).

        returns (1,128) = tbl[pos >> 7, pos & 127] per lane.

        Lane shuffle FIRST (lane j must fold column c_j's data with its
        own row bits), then a binary fold on the row bits down to one
        (8,128) vreg, then a sublane select.
        """
        r = pos >> 7                      # (1,128) in [0, bh)
        cb = jnp.broadcast_to(pos & 127, (bh, 128))
        cur = jnp.take_along_axis(tbl, cb, axis=1)   # cur[i,j]=tbl[i,c_j]
        rows = bh
        while rows > 8:
            half = rows >> 1
            take_hi = (r & half) != 0     # (1,128) bool
            lo, hi = cur[:half], cur[half:rows]
            cur = jnp.where(jnp.broadcast_to(take_hi, (half, 128)),
                            hi, lo)
            rows = half
        # sublane select on r & 7
        rb = jnp.broadcast_to(r & 7, (8, 128))
        sel = jnp.take_along_axis(cur, rb, axis=0)     # (8,128), row 0 ok
        return sel[:1]

    def run_one(name, bh, lane_rows):
        b, t0h, t1h, idxh = make_case(bh)
        tbl0 = jnp.asarray(t0h)
        tbl1 = jnp.asarray(t1h)
        idx = jnp.asarray(idxh[:, :lane_rows])

        def kernel(t0_ref, t1_ref, idx_ref, out_ref):
            t0, t1 = t0_ref[:], t1_ref[:]

            def body(_, pos):  # pos: (lane_rows,128)
                nxt = []
                for s in range(lane_rows):
                    p = pos[s:s + 1]
                    w0 = fold_fetch(t0, p, bh)
                    w1 = fold_fetch(t1, p, bh)
                    nxt.append((w0 + (w1 >> 4)) % b)
                return jnp.concatenate(nxt, axis=0) \
                    if lane_rows > 1 else nxt[0]

            out_ref[0] = jax.lax.fori_loop(0, steps, body, idx_ref[0])

        f = pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((bh, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lane_rows, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, lane_rows, 128),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tiles, lane_rows, 128),
                                           jnp.int32),
            interpret=args.interpret,
        )
        fj = jax.jit(f)
        with jax.enable_x64(False):
            out = fj(tbl0, tbl1, idx)
            _sync_scalar(out)
            t0 = time.perf_counter()
            reps = 1 if args.interpret else 5
            for _ in range(reps):
                out = fj(tbl0, tbl1, idx)
            _sync_scalar(out)
            dt = (time.perf_counter() - t0) / reps
        lanes = tiles * lane_rows * 128
        print(f"  {name:14s}: {dt*1e3:8.2f} ms  "
              f"{lanes*steps/dt/1e6:8.1f} M lane-steps/s", flush=True)

        # host replay
        pos = idxh[:, :lane_rows].copy()
        for _ in range(steps):
            w0 = t0h[pos >> 7, pos & 127]
            w1 = t1h[pos >> 7, pos & 127]
            pos = (w0 + (w1 >> 4)) % b
        ok = np.array_equal(np.asarray(out), pos)
        print(f"                values {'MATCH' if ok else 'MISMATCH'}")

    for name, bh, lane_rows in (
        ("fold256 x128", 256, 1),
        ("fold256 x1024", 256, 8),
        ("fold32  x1024", 32, 8),
        ("fold512 x1024", 512, 8),
    ):
        try:
            run_one(name, bh, lane_rows)
        except Exception as e:
            print(f"  {name:14s}: FAILED — {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
