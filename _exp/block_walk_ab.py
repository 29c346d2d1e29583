#!/usr/bin/env python
"""A/B: default-workload refinement with the in-VMEM block walker on/off.

Runs the default pipeline's partition + refinement on the bench field at
--size, once per engine setting, from the SAME partition labels, and
asserts the results are voxel-identical (the screened walk is exact
either way).  Prints per-mode warm wall and the per-stage refine split.

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/block_walk_ab.py --size 384

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
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--modes", default="off,on")
    args = ap.parse_args()

    from bench import _enable_cache, synthetic_density_device, _sync_scalar
    _enable_cache()
    import jax.numpy as jnp
    from pybader_tpu import grid as g, pipeline
    from pybader_tpu.ops import block_walk as bw

    shape = (args.size,) * 3
    lattice = np.diag([12.0, 12.5, 13.0])
    t0 = time.perf_counter()
    rho, _ = synthetic_density_device(shape)
    _sync_scalar(rho)
    print(f"field: {time.perf_counter() - t0:.1f}s", flush=True)
    w = tuple(g.distance_weights(lattice, shape))
    tg = g.t_grad(lattice, shape)

    sums = {}
    for mode in args.modes.split(","):
        bw._ENABLED = mode == "on"
        results = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            carry = {}
            labels, maxima = pipeline.partition_neargrid(
                rho, None, w, tg, carry_out=carry)
            t_part = time.perf_counter() - t0
            t0 = time.perf_counter()
            labels, changed = pipeline.refine_labels(
                "neargrid", ("changed", 2), rho, labels, w, tg,
                verbose=False, carry_in=carry or None)
            _sync_scalar(labels)
            t_ref = time.perf_counter() - t0
            print(f"  {mode:3s} rep{rep}: partition {t_part:6.2f}s  "
                  f"refine {t_ref:6.2f}s  total "
                  f"{t_part + t_ref:6.2f}s  ({len(maxima)} basins, "
                  f"changed {changed})", flush=True)
            results.append(labels)
        # position-weighted f64 checksum (exact: < 2^53), never fetch grids
        wgt = (jnp.arange(results[-1].size, dtype=jnp.float64)
               % 1000003.0).reshape(shape)
        chk = float(jnp.sum(results[-1].astype(jnp.float64) * wgt))
        nlab = int(jnp.max(results[-1])) + 1
        sums[mode] = chk
        print(f"  {mode:3s} label checksum {chk:.0f} ({nlab} labels)",
              flush=True)
        del results
    if len(sums) > 1:
        vals = set(sums.values())
        print("MODES IDENTICAL" if len(vals) == 1
              else f"MODES DIFFER: {sums}", flush=True)


if __name__ == "__main__":
    # release HBM explicitly before exiting: an exception/teardown that
    # dies with buffers held leaks the chip for ~10-20 min (bench.py
    # _clean_exit doc) and blocks every later large allocation
    try:
        main()
    except BaseException:
        import traceback

        traceback.print_exc()
    finally:
        from bench import _clean_exit

        _clean_exit()
