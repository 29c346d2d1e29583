#!/usr/bin/env python
"""How much would (pos, dr==0) lane dedup save in refinement walks?

A lane that just took an ongrid fallback (flat gradient or revisit) has
dr == 0 exactly; from that state its future is a pure function of
position.  If many live lanes share such a state (watershed "rivers"),
a dedup at compaction boundaries could retire followers early and walk
each river once.  This probe runs refinement-iteration-1 walks on the
bench field (CPU, small grid) and reports, at each segment boundary,
how many live lanes are duplicates of another live lane at the same
(pos, dr==0) — the retireable fraction — plus duplicates at the same
pos with ANY equal dr (bit-equal f64 triple).

Usage:
    JAX_PLATFORMS=cpu PYTHONPATH=. python _exp/dedup_potential.py \
        [--grid 96]

Single-purpose measurement script; not part of the package.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=96)
    args = ap.parse_args()

    import jax.numpy as jnp
    from bench import synthetic_density
    from pybader_tpu import grid as g, pipeline
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import neargrid as ng
    from pybader_tpu.ops.stencil import parent_from_step_codes

    shape = (args.grid,) * 3
    lattice = np.diag([20.0] * 3)
    rho = synthetic_density(shape, n_blobs=max(8, 60 * args.grid ** 3
                                               // 384 ** 3))
    w = tuple(g.distance_weights(lattice, shape))
    tg = g.t_grad(lattice, shape)
    rho_dev = jnp.asarray(rho)

    labels, maxima = pipeline.partition_ongrid(rho_dev, None, w)
    bk = pipeline._step_codes_auto(rho_dev, w)
    vac = labels == -1
    bk = jnp.where(vac, jnp.uint8(13), bk)
    parent = parent_from_step_codes(bk)
    is_max = (bk == jnp.uint8(13)) & ~vac
    known = edges_ops.edge_find(rho_dev, labels, is_max)
    edge_mask = np.asarray((known == -2).reshape(-1))
    starts = np.flatnonzero(edge_mask).astype(np.int32)
    print(f"grid {args.grid}^3, {maxima.shape[0]} basins, "
          f"{len(starts)} edge voxels", flush=True)

    rows = ng.precompute_rows(rho_dev, parent, jnp.asarray(tg),
                              strict_grad=True)
    rows = ng.update_stop(rows, (known == 2).reshape(-1))

    padded = jnp.asarray(ng.pad_starts(starts))
    state = ng._init_state(padded, rows.dtype)
    steps_done = 0
    total_live_steps = 0
    dedup_live_steps = 0
    seg = 8
    while steps_done < 512:
        state = ng._walk_segment_packed(state, rows, shape, seg,
                                        early_exit=True)
        steps_done += seg
        pos, prev, hist, dr, done = state
        alive = ~np.asarray(done)
        n_alive = int(alive.sum())
        if n_alive == 0:
            break
        p = np.asarray(pos)[alive]
        d = np.asarray(dr)[alive]
        zero = (d == 0).all(axis=1)
        # duplicates among (pos, dr==0) lanes
        pz = p[zero]
        uz = len(np.unique(pz))
        dup_zero = len(pz) - uz
        # duplicates among ALL lanes keyed on (pos, dr bits)
        key = np.concatenate([p[:, None].astype(np.int64).view(np.int64),
                              d.view(np.int64) if d.dtype == np.float64
                              else d.astype(np.float64).view(np.int64)],
                             axis=1)
        uniq = len(np.unique(key, axis=0))
        dup_any = n_alive - uniq
        total_live_steps += n_alive * seg
        dedup_live_steps += uniq * seg
        print(f"  step {steps_done:4d}: live {n_alive:8d}  dr==0 "
              f"{int(zero.sum()):8d}  dup(pos,dr0) {dup_zero:8d}  "
              f"dup(pos,dr) {dup_any:8d}", flush=True)
        seg = min(seg * 2, 64)
    print(f"live lane-step integral: {total_live_steps/1e6:.1f}M; "
          f"with exact-state dedup: {dedup_live_steps/1e6:.1f}M "
          f"({100*(1-dedup_live_steps/max(total_live_steps,1)):.0f}% saved)",
          flush=True)


if __name__ == "__main__":
    main()
