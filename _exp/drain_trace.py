#!/usr/bin/env python
"""Per-segment trace of one refinement trajectory walk (BASELINE.md).

Reproduces the walker's drain schedule on a real refinement edge set:
builds the bench field at the requested size, runs the ongrid partition,
finds the edge set, and walks it once with per-segment timestamps —
reporting live-lane decay, bucket shrink points, paid (padded) vs live
lane-steps, and the end-to-end lane-step rate the BASELINE.md roofline
discussion quotes.

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/drain_trace.py --size 384

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
    ap.add_argument("--qrows", action="store_true",
                    help="walk the shipping screened quantised-row path")
    args = ap.parse_args()

    from bench import _enable_cache, _sync_scalar, synthetic_density_device
    _enable_cache()

    import jax.numpy as jnp

    from pybader_tpu import grid, pipeline
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import neargrid as neargrid_ops
    from pybader_tpu.ops.reductions import compact_indices
    from pybader_tpu.ops.stencil import parent_from_step_codes

    size = args.size
    shape = (size,) * 3
    lattice = np.diag([20.0] * 3)
    rho, _ = synthetic_density_device(shape)
    _sync_scalar(rho)
    w = tuple(grid.distance_weights(lattice, shape))
    tg = jnp.asarray(grid.t_grad(lattice, shape))

    labels, maxima = pipeline.partition_ongrid(rho, None, w)
    bk = pipeline._step_codes_auto(rho, w)
    parent = parent_from_step_codes(bk)
    is_max = (bk == jnp.uint8(13)) & (labels != -1)
    known = edges_ops.edge_find(rho, labels, is_max)
    edge_mask = (known == -2).reshape(-1)
    n_edges = int(jnp.sum(edge_mask))
    bucket = max(4096, 1 << (n_edges - 1).bit_length())
    starts = compact_indices(edge_mask, bucket)
    print(f"{size}^3: {len(maxima)} basins, {n_edges} edges "
          f"(bucket {bucket}, {n_edges / bucket:.0%} occupied)")

    if args.qrows:
        rows = neargrid_ops.precompute_qrows(rho, bk, tg, strict_grad=True)
        rows = neargrid_ops.update_stop_q(rows, (known == 2).reshape(-1))
        exact = {"rows": None}

        def exact_fields():
            if exact["rows"] is None:
                exact["rows"] = neargrid_ops.update_stop(
                    neargrid_ops.precompute_rows(
                        rho, parent, tg, strict_grad=True),
                    (known == 2).reshape(-1))
            return exact["rows"]
    else:
        rows = neargrid_ops.precompute_rows(rho, parent, tg,
                                            strict_grad=True)
        rows = neargrid_ops.update_stop(rows, (known == 2).reshape(-1))

    for rep in range(args.reps):
        log = []
        t_start = time.perf_counter()
        if args.qrows:
            pos, done = neargrid_ops.walk_drain_screened(
                starts, tg, shape, rows, exact_fields, strict_grad=True,
                max_steps=192,
                progress=lambda s, alive: log.append(
                    (time.perf_counter(), s, alive)))
        else:
            pos, done = neargrid_ops.walk_drain(
                starts, None, None, None, tg, shape, strict_grad=True,
                max_steps=192, fields=rows,
                progress=lambda s, alive: log.append(
                    (time.perf_counter(), s, alive)))
        n_done = int(jnp.sum(done))
        total = time.perf_counter() - t_start
        prev_t, prev_s, prev_alive = t_start, 0, n_edges
        paid = live = 0
        for ts, s, alive in log:
            seg = s - prev_s
            bucket_now = max(4096, neargrid_ops._bucket_size(prev_alive))
            paid += seg * min(bucket_now, bucket)
            live += seg * prev_alive
            if rep == args.reps - 1:
                print(f"  step {s:4d} (+{seg:3d}): {alive:9d} alive  "
                      f"+{ts - prev_t:6.3f}s")
            prev_t, prev_s, prev_alive = ts, s, alive
        print(f"[rep {rep}] walk: {total:.3f}s, {n_done}/{bucket} done, "
              f"~{live / 1e6:.0f}M live / ~{paid / 1e6:.0f}M paid "
              f"lane-steps, {paid / total / 1e6:.0f}M paid lane-steps/s")


if __name__ == "__main__":
    main()
