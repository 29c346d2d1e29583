#!/usr/bin/env python
"""Sub-stage budget of ONE refinement iteration at scale (BASELINE.md).

Times each fixed-cost component the refine_labels loop pays per iteration
— stop-bit rebake, edge stencils, edge compaction, candidate filter, the
post-walk fused update — plus the per-dispatch/sync floor of the walker's
segment boundaries (a dispatch + scalar count fetch through the axon
tunnel), so schedule choices are grounded in measured overheads instead
of lane-step arithmetic alone.

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/refine_budget.py --size 384

Single-purpose measurement script; not part of the package.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, sync, reps=3):
    fn()
    sync()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        sync()
        best = min(best, time.perf_counter() - t0)
    print(f"  {name:38s}: {best:7.3f}s")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=384)
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
    print(f"{size}^3, {len(maxima)} basins")

    def s():
        return _sync_scalar(labels[0, 0, :8])

    known = edges_ops.edge_find(rho, labels, is_max)
    bench("edge_find (full grid)",
          lambda: edges_ops.edge_find(rho, labels, is_max), s)
    bench("edge_check (changed rescan)",
          lambda: edges_ops.edge_check(known, rho, labels, is_max), s)

    edge_mask = (known == -2).reshape(-1)
    n_edges = int(jnp.sum(edge_mask))
    bucket = max(4096, 1 << (n_edges - 1).bit_length())
    print(f"  ({n_edges} edges, bucket {bucket})")
    bench("compact_indices (full-grid sort)",
          lambda: compact_indices(edge_mask, bucket), s)

    rows = neargrid_ops.precompute_rows(rho, parent, tg, strict_grad=True)
    stop = (known == 2).reshape(-1)

    def rebake():
        nonlocal rows
        rows = neargrid_ops.update_stop(rows, stop)
        return rows

    bench("update_stop (rows rebake, donated)", rebake, s)

    starts = compact_indices(edge_mask, bucket)
    state = neargrid_ops._init_state(starts, rows.dtype)

    # per-dispatch floor: 1-step segments at decreasing bucket sizes
    for k in (1 << 22, 1 << 19, 1 << 16, 4096):
        sub = tuple(x[:k] for x in state)
        dt = bench(f"1-step segment @ {k} lanes",
                   lambda: neargrid_ops._walk_segment_counted(
                       sub, rows, shape, 1, early_exit=False), s)
    # scalar count fetch round trip (the per-boundary sync)
    st2, cnt = neargrid_ops._walk_segment_counted(
        tuple(x[:4096] for x in state), rows, shape, 1, early_exit=False)
    bench("count fetch (int(cnt))", lambda: int(cnt), lambda: None)

    # 32-step segments: amortised per-step rate by bucket size
    for k in (1 << 22, 1 << 20, 1 << 18, 1 << 16):
        sub = tuple(x[:k] for x in state)

        def run():
            st, c = neargrid_ops._walk_segment_counted(
                sub, rows, shape, 32, early_exit=False)
            return int(c)

        dt = bench(f"32-step segment @ {k} lanes", run, lambda: None)
        print(f"      -> {k * 32 / dt / 1e6:7.1f}M lane-steps/s")

    # compaction cost at walker bucket sizes
    for k in (1 << 22, 1 << 20, 1 << 18):
        sub = tuple(x[:k] for x in state)
        bench(f"_compact_state {k} -> {k // 2}",
              lambda: neargrid_ops._compact_state(sub, k // 2), s)


if __name__ == "__main__":
    main()
