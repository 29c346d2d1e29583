#!/usr/bin/env python
"""Sweep hybrid configs (init x internal iterations) vs the serial reference.

Measures, for each hybrid configuration, the deviation from
native/serial_neargrid.cpp at the shipping refine_mode=('changed', 2):
% voxels differing and per-atom |dq|.  One serial run is shared across
configs.  Used to choose _NGINIT_HYBRID_REFINE / the hybrid init
(BASELINE.md records the chosen point).

Usage:
    python _exp/hybrid_sweep.py --size 128

Single-purpose measurement script; not part of the package.
"""
import argparse
import ctypes
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hybrid_accuracy import atom_charges, basin_maxima, build_serial  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from bench import synthetic_density

    size = args.size
    shape = (size, size, size)
    n = size ** 3
    lattice = np.diag([20.0] * 3)
    rho, centers = synthetic_density(shape, return_centers=True)
    rho = np.ascontiguousarray(rho)
    atoms_cart = centers @ lattice

    from pybader_tpu import grid, pipeline
    w = np.ascontiguousarray(grid.distance_weights(lattice, shape))
    tg = np.ascontiguousarray(grid.t_grad(lattice, shape))
    vox_vol = grid.voxel_volume(lattice, shape)

    lib = build_serial()
    dp = ctypes.POINTER(ctypes.c_double)
    lab_ref = np.empty(shape, dtype=np.int32)
    nm_ref = lib.sn_neargrid(
        rho.ctypes.data_as(dp), *shape, w.ctypes.data_as(dp),
        tg.ctypes.data_as(dp),
        lab_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    lib.sn_refine(
        rho.ctypes.data_as(dp), *shape, w.ctypes.data_as(dp),
        tg.ctypes.data_as(dp),
        lab_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_long(args.iters))
    mx_ref = basin_maxima(lab_ref, rho, nm_ref)
    key = lambda m: (m[:, 0].astype(np.int64) * shape[1] + m[:, 1]) \
        * shape[2] + m[:, 2]  # noqa: E731
    ref_by_max = dict(zip(key(mx_ref).tolist(), range(nm_ref)))
    q_ref = None

    configs = [
        ("ongrid", 1), ("ongrid", 2), ("ongrid", 3),
        ("nginit", 1), ("nginit", 2), ("nginit", 3),
    ]
    if os.environ.get("PYBADER_TPU_SWEEP_CONFIGS"):
        configs = [
            (c.split(":")[0], int(c.split(":")[1]))
            for c in os.environ["PYBADER_TPU_SWEEP_CONFIGS"].split(",")
        ]
    for init, internal in configs:
        os.environ["PYBADER_TPU_HYBRID_INIT"] = init
        old_ng = pipeline._NGINIT_HYBRID_REFINE
        old_og = pipeline._NEARGRID_HYBRID_REFINE
        pipeline._NGINIT_HYBRID_REFINE = ("changed", internal)
        pipeline._NEARGRID_HYBRID_REFINE = ("changed", internal)
        t0 = time.perf_counter()
        stats = {}
        try:
            carry = {}
            labels, maxima = pipeline.partition_neargrid(
                rho, None, tuple(w), tg, full_trajectories=False,
                carry_out=carry)
            labels, _ = pipeline.refine_labels(
                "neargrid", ("changed", args.iters), rho, labels,
                tuple(w), tg, verbose=False, stats=stats,
                carry_in=carry or None)
        finally:
            pipeline._NGINIT_HYBRID_REFINE = old_ng
            pipeline._NEARGRID_HYBRID_REFINE = old_og
            os.environ.pop("PYBADER_TPU_HYBRID_INIT", None)
        lab_hyb = np.asarray(labels)
        wall = time.perf_counter() - t0
        assert nm_ref == len(maxima)
        perm = np.empty(nm_ref, dtype=np.int32)
        for hyb_id, kk in enumerate(key(np.asarray(maxima)).tolist()):
            perm[ref_by_max[kk]] = hyb_id
        lab_ref_mapped = perm[lab_ref]
        if q_ref is None:
            q_ref = atom_charges(lab_ref_mapped, np.asarray(maxima), rho,
                                 shape, lattice, atoms_cart, vox_vol)
        mism = int(np.sum(lab_ref_mapped != lab_hyb))
        q_hyb = atom_charges(lab_hyb, maxima, rho, shape, lattice,
                             atoms_cart, vox_vol)
        dq = np.abs(q_ref - q_hyb)
        total = float(np.sum(rho) * vox_vol)
        edges = sum(t[0] for t in stats.get("iterations", []))
        print(f"{init} internal={internal}: mismatch "
              f"{100.0 * mism / n:.4f}%  max|dq| {dq.max():.3e} "
              f"({100.0 * dq.max() / total:.2e}% of total)  "
              f"user-edges {edges}  wall {wall:.0f}s", flush=True)


if __name__ == "__main__":
    main()
