#!/usr/bin/env python
"""Per-stage wall-clock budget of the DEFAULT acceptance pipeline on TPU.

Runs the default workload (hybrid neargrid partition + ('changed', 2)
refinement via the carry + atoms + surface distance + charge sums) at the
requested size with per-stage timers and per-walk-segment timestamps —
the instrumentation behind BASELINE.md's default-workload budget table.
Timing is by device-scalar fetch (block_until_ready is unreliable through
the axon tunnel).

Usage:
    PYTHONPATH=.:/root/.axon_site python _exp/default_budget.py --size 384

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
    ap.add_argument("--passes", type=int, default=2,
                    help="full pipeline passes (first is the warm pass)")
    args = ap.parse_args()

    from bench import _enable_cache, _sync_scalar, synthetic_density_device
    _enable_cache()

    import jax.numpy as jnp

    from pybader_tpu import grid, pipeline
    from pybader_tpu.ops import atoms as atoms_ops
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import reductions

    import jax

    def hbm(tag):
        """Device-memory watermark (best effort; axon may not report)."""
        try:
            s = jax.local_devices()[0].memory_stats() or {}
            print(f"    [hbm {tag}] in_use "
                  f"{s.get('bytes_in_use', 0) / 1e9:.2f} GB, peak "
                  f"{s.get('peak_bytes_in_use', 0) / 1e9:.2f} GB, limit "
                  f"{s.get('bytes_limit', 0) / 1e9:.2f} GB", flush=True)
        except Exception as e:
            print(f"    [hbm {tag}] unavailable: {e}", flush=True)

    size = args.size
    shape = (size, size, size)
    lattice = np.diag([20.0] * 3)
    t0 = time.perf_counter()
    rho, centers = synthetic_density_device(shape)
    _sync_scalar(rho)
    print(f"density synth: {time.perf_counter() - t0:.2f}s")
    atoms_cart = centers @ lattice
    w = tuple(grid.distance_weights(lattice, shape))
    tg = grid.t_grad(lattice, shape)

    for p in range(args.passes):
        tag = "warm" if p == 0 else f"pass{p}"
        tp0 = time.perf_counter()

        t0 = time.perf_counter()
        carry = {}
        # stage: ongrid partition (inside partition_neargrid's hybrid)
        labels, maxima = pipeline.partition_ongrid(rho, None, w)
        _sync_scalar(labels)
        t_part = time.perf_counter() - t0
        print(f"[{tag}] partition_ongrid: {t_part:.2f}s "
              f"({len(maxima)} basins)")
        hbm("post-partition")

        # stage: hybrid-internal refinement (resolution-scaled budget,
        # pipeline._hybrid_internal_budget) with carry out
        seg_log = []
        tick = lambda msg: seg_log.append(  # noqa: E731
            (time.perf_counter(), msg))
        t0 = time.perf_counter()
        stats = {"detail": True}
        try:
            labels, ch1 = pipeline.refine_labels(
                "neargrid", pipeline._hybrid_internal_budget(rho.shape), rho, labels,
                w, tg, verbose=False, stats=stats, progress=tick,
                carry_out=carry)
        except Exception:
            hbm("AT-HYBRID-FAILURE")
            raise
        t_hyb = time.perf_counter() - t0
        print(f"[{tag}] hybrid refine {pipeline._hybrid_internal_budget(rho.shape)}: "
              f"{t_hyb:.2f}s, iters={stats.get('iterations')}")
        hbm("post-hybrid")
        for i, d in enumerate(stats.get("stages", [])):
            print(f"    it{i + 1} stages: {d}")

        # stage: user refinement ('changed', 2) chained via carry
        t0 = time.perf_counter()
        stats2 = {"detail": True}
        labels, ch2 = pipeline.refine_labels(
            "neargrid", ("changed", 2), rho, labels, w, tg,
            verbose=False, stats=stats2, progress=tick,
            carry_in=carry or None)
        t_ref = time.perf_counter() - t0
        print(f"[{tag}] user refine ('changed', 2): {t_ref:.2f}s, "
              f"iters={stats2.get('iterations')}")
        hbm("post-user-refine")
        for i, d in enumerate(stats2.get("stages", [])):
            print(f"    it{i + 1} stages: {d}")

        # walk-segment trace (time deltas between progress ticks)
        if p == 0 and seg_log:
            prev = None
            for ts, msg in seg_log:
                d = 0.0 if prev is None else ts - prev
                prev = ts
                print(f"    +{d:6.2f}s {msg}")

        t0 = time.perf_counter()
        mx_cart = (np.asarray(maxima) / np.asarray(shape)) @ lattice
        atom_of_max, _ = atoms_ops.assign_to_atoms(
            jnp.asarray(mx_cart), jnp.asarray(atoms_cart),
            jnp.asarray(lattice))
        atoms_volumes = reductions.relabel(labels, atom_of_max)
        _sync_scalar(atoms_volumes)
        t_atoms = time.perf_counter() - t0
        print(f"[{tag}] atoms+relabel: {t_atoms:.2f}s")

        t0 = time.perf_counter()
        known = edges_ops.edge_find(rho, atoms_volumes)
        dists = atoms_ops.surface_distance_masked(
            atoms_volumes, known == -2, jnp.asarray(lattice),
            jnp.asarray(atoms_cart), len(atoms_cart))
        _sync_scalar(dists)
        t_surf = time.perf_counter() - t0
        print(f"[{tag}] edge_find+surface: {t_surf:.2f}s")

        t0 = time.perf_counter()
        charge, counts = reductions.charge_volume_sum(
            rho, atoms_volumes, 1.0, len(atoms_cart))
        _sync_scalar(charge)
        t_sum = time.perf_counter() - t0
        print(f"[{tag}] charge sums: {t_sum:.2f}s")
        hbm("end-of-pass")

        total = time.perf_counter() - tp0
        print(f"[{tag}] TOTAL: {total:.2f}s "
              f"({size ** 3 / total / 1e6:.1f} Mvox/s)  "
              f"[part {t_part:.2f} hyb {t_hyb:.2f} ref {t_ref:.2f} "
              f"atoms {t_atoms:.2f} surf {t_surf:.2f} sums {t_sum:.2f}]")


if __name__ == "__main__":
    main()
