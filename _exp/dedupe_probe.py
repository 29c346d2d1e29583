#!/usr/bin/env python
"""Measure trajectory-state duplication mid-walk (dedupe potential).

Lanes that reach the same voxel with identical walker state (pos, prev,
hist, dr) replay identical futures — after any ongrid-fallback event dr
resets to 0, so merges are exact, not approximate.  If the duplication
fraction is large, a sort-based dedupe at compaction boundaries would cut
the walk's real gather count.  This measures, at several step depths of a
384^3 refinement iteration-1 walk: alive lanes, unique positions (merge
upper bound), and unique full states (exact-dedupe win).

Usage: PYTHONPATH=.:/root/.axon_site python _exp/dedupe_probe.py [--size 384]
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
    args = ap.parse_args()

    from bench import _enable_cache, _sync_scalar, synthetic_density_device
    _enable_cache()
    import jax
    import jax.numpy as jnp

    from pybader_tpu import grid, pipeline
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import neargrid as ng
    from pybader_tpu.ops.reductions import compact_indices
    from pybader_tpu.ops.stencil import parent_from_step_codes

    size = args.size
    shape = (size, size, size)
    lattice = np.diag([20.0] * 3)
    rho, _ = synthetic_density_device(shape)
    _sync_scalar(rho)
    w = tuple(grid.distance_weights(lattice, shape))
    tg = grid.t_grad(lattice, shape)

    labels, maxima = pipeline.partition_ongrid(rho, None, w)
    bk = pipeline._step_codes_auto(rho, w)
    parent = parent_from_step_codes(bk)
    is_max = bk == jnp.uint8(13)
    known = edges_ops.edge_find(rho, labels, is_max)
    edge_mask = (known == -2).reshape(-1)
    n_edges = int(jnp.sum(edge_mask))
    bucket = max(4096, 1 << (n_edges - 1).bit_length())
    starts = compact_indices(edge_mask, bucket)
    rows = ng.precompute_rows(rho, parent, jnp.asarray(tg),
                              strict_grad=True)
    rows = ng.update_stop(rows, (known == 2).reshape(-1))
    print(f"{n_edges} edges, bucket {bucket}", flush=True)

    state = ng._init_state(jnp.asarray(starts), rows.dtype)

    def uniq_count(keys):
        s = jnp.sort(keys)
        return int(jnp.sum(s != jnp.concatenate(
            [jnp.full((1,), -1 << 30, s.dtype), s[:-1]])))

    steps_done = 0
    for seg in (8, 8, 16, 32, 64):
        t0 = time.perf_counter()
        state, cnt = ng._walk_segment_counted(
            state, rows, shape, seg, early_exit=False)
        n_alive = int(cnt)
        steps_done += seg
        pos, prev, hist, dr, done = state
        big = jnp.int32(np.iinfo(np.int32).max)
        pos_a = jnp.where(done, big, pos)
        u_pos = uniq_count(pos_a)
        # full-state uniqueness: fold pos/prev/dr-bits into one i32 hash
        # (collisions only UNDERcount uniques, i.e. overcount the win)
        h = pos
        for part in (prev, hist[:, 0],
                     jax.lax.bitcast_convert_type(dr[:, 0], jnp.int32),
                     jax.lax.bitcast_convert_type(dr[:, 1], jnp.int32),
                     jax.lax.bitcast_convert_type(dr[:, 2], jnp.int32)):
            h = h * jnp.int32(1000003) + part
        h = jnp.where(done, big, h)
        u_state = uniq_count(h)
        dr0 = int(jnp.sum((~done) & jnp.all(dr == 0.0, axis=1)))
        print(f"step {steps_done}: alive {n_alive}, unique pos {u_pos} "
              f"({100.0 * u_pos / max(n_alive, 1):.0f}%), unique state "
              f"~{u_state} ({100.0 * u_state / max(n_alive, 1):.0f}%), "
              f"dr==0 lanes {dr0} [{time.perf_counter() - t0:.1f}s]",
              flush=True)


if __name__ == "__main__":
    main()
