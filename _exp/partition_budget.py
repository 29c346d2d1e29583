#!/usr/bin/env python
"""Per-stage wall-clock budget of the HEADLINE partition workload on TPU.

Splits `pipeline.partition_ongrid` + per-basin charge sums (the bench
headline, bench.py:292-297) into its stages: dd-Pallas stencil -> step
codes, directional-scan label flooding, discovery-order renumbering, and
the charge/volume reduction — the instrumentation behind BASELINE.md's
headline-budget table.  Timing by device-scalar fetch.

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/partition_budget.py \
        [--size 384] [--reps 3]

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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import _enable_cache, _sync_scalar, synthetic_density_device
    _enable_cache()

    import jax.numpy as jnp

    from pybader_tpu import grid, pipeline
    from pybader_tpu.ops import reductions, scanflood

    shape = (args.size,) * 3
    lattice = np.diag([20.0] * 3)
    t0 = time.perf_counter()
    rho, _ = synthetic_density_device(shape)
    _sync_scalar(rho)
    print(f"density synth: {time.perf_counter() - t0:.2f}s", flush=True)
    w = tuple(grid.distance_weights(lattice, shape))
    n = int(np.prod(shape))
    iota = jnp.arange(n, dtype=jnp.int32).reshape(shape)

    for rep in range(args.reps):
        t0 = time.perf_counter()
        bk = pipeline._step_codes_auto(rho, w)
        _sync_scalar(bk)
        t_st = time.perf_counter()
        labels_mo, n_max = scanflood.labels_scanflood(bk, None)
        _sync_scalar(labels_mo)
        t_fl = time.perf_counter()
        is_max = bk == jnp.uint8(13)
        n_max = max(int(n_max), 1)
        labels, maxima = pipeline.renumber_discovery(
            labels_mo, is_max, None, n_max, iota)
        _sync_scalar(labels)
        t_rn = time.perf_counter()
        charge, counts = reductions.charge_volume_sum(
            rho, labels, 1.0, n_max)
        total = float(jnp.sum(charge))
        t_cs = time.perf_counter()
        print(
            f"[rep {rep}] stencil {t_st - t0:.3f}s  flood {t_fl - t_st:.3f}s"
            f"  renumber {t_rn - t_fl:.3f}s  sums {t_cs - t_rn:.3f}s"
            f"  TOTAL {t_cs - t0:.3f}s ({n / (t_cs - t0) / 1e6:.1f} Mvox/s,"
            f" {n_max} basins, q={total:.3f})", flush=True)


if __name__ == "__main__":
    main()
