#!/usr/bin/env python
"""Prototype: disagreement-seeded trajectory completion for the hybrid.

Init idea: flood BOTH the ongrid codes and the neargrid-first-step codes;
where the two labelings agree the label is trusted; the disagreement band
(dilated by 1) is walked with FULL neargrid trajectories that terminate on
arrival in the agreed region (label adoption).  This re-walks exactly the
voxels the ongrid init may get wrong, instead of waiting for the edge
front to cross the band one voxel per refinement iteration.

Measures, at --size on CPU: band size, walk cost proxy (lane-steps), and
mismatch vs the serial reference at ('changed', 2) and vs the converged
truth, compared against the shipping hybrid.

Usage: python _exp/band_walk.py --size 128
"""
import argparse
import ctypes
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hybrid_accuracy import basin_maxima, build_serial  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--internal", type=int, default=0,
                    help="('changed', N) internal refinement after the "
                         "band walk, chained into the user refine")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import synthetic_density
    from pybader_tpu import grid, pipeline
    from pybader_tpu.ops import edges as edges_ops
    from pybader_tpu.ops import neargrid as neargrid_ops
    from pybader_tpu.ops.stencil import (
        neargrid_init_codes, parent_from_step_codes,
    )
    from pybader_tpu.ops.pointer import label_volumes

    size = args.size
    shape = (size, size, size)
    n = size ** 3
    lattice = np.diag([20.0] * 3)
    rho, centers = synthetic_density(shape, return_centers=True)
    rho = np.ascontiguousarray(rho)
    w = np.ascontiguousarray(grid.distance_weights(lattice, shape))
    tg = np.ascontiguousarray(grid.t_grad(lattice, shape))

    # serial reference at the shipping config + converged truth
    lib = build_serial()
    dp = ctypes.POINTER(ctypes.c_double)
    lab_ref = np.empty(shape, dtype=np.int32)
    nm_ref = lib.sn_neargrid(
        rho.ctypes.data_as(dp), *shape, w.ctypes.data_as(dp),
        tg.ctypes.data_as(dp),
        lab_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    lib.sn_refine(rho.ctypes.data_as(dp), *shape, w.ctypes.data_as(dp),
                  tg.ctypes.data_as(dp),
                  lab_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                  ctypes.c_long(2))
    lab_tru = np.ascontiguousarray(lab_ref.copy())
    lib.sn_refine(rho.ctypes.data_as(dp), *shape, w.ctypes.data_as(dp),
                  tg.ctypes.data_as(dp),
                  lab_tru.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                  ctypes.c_long(-1))
    print(f"serial: {nm_ref} basins")

    rho_j = jnp.asarray(rho)
    t0 = time.perf_counter()
    bk_og = pipeline._step_codes_auto(rho_j, tuple(w))
    lab_og, maxima = pipeline.partition_ongrid(rho_j, None, tuple(w))
    bk_ng = neargrid_init_codes(rho_j, bk_og, jnp.asarray(tg))
    lab_ng, _ = label_volumes(parent_from_step_codes(bk_ng), None, bk_ng)
    print(f"two floods: {time.perf_counter() - t0:.1f}s")

    suspect = np.asarray(edges_ops._dilate26(lab_og != lab_ng))
    print(f"suspect band: {suspect.sum()} voxels "
          f"({100.0 * suspect.sum() / n:.2f}%)")

    # fat walk: full trajectories from every suspect voxel, stopping on
    # arrival in the agreed (non-suspect) region; non-strict gradient
    # flavour (this substitutes for the INITIAL pass, methods.py:324)
    t0 = time.perf_counter()
    parent = parent_from_step_codes(bk_og)
    starts = neargrid_ops.pad_starts(
        np.flatnonzero(suspect.reshape(-1)).astype(np.int32))
    pos, done = neargrid_ops.walk_drain(
        jnp.asarray(starts), rho_j.reshape(-1), parent.reshape(-1),
        jnp.asarray(~suspect.reshape(-1)), jnp.asarray(tg), shape,
        strict_grad=False)
    if not bool(jnp.all(done)):
        from pybader_tpu.ops.pointer import resolve_roots_auto

        roots = resolve_roots_auto(parent, bk_og).reshape(-1)
        pos = jnp.where(done, pos, jnp.take(roots, pos, mode="clip"))
    lab_flat = jnp.asarray(lab_og).reshape(-1)
    new_lab = jnp.take(lab_flat, pos, mode="clip")
    valid = jnp.asarray(starts) >= 0
    idx = jnp.where(valid, jnp.asarray(starts), n)
    lab_band = np.asarray(
        lab_flat.at[idx].set(new_lab, mode="drop")).reshape(shape)
    print(f"band walk: {time.perf_counter() - t0:.1f}s")

    # chained refinement at the shipping config
    t0 = time.perf_counter()
    labels = jnp.asarray(lab_band)
    carry = {}
    if args.internal:
        labels, _ = pipeline.refine_labels(
            "neargrid", ("changed", args.internal), rho_j, labels,
            tuple(w), tg, verbose=False, carry_out=carry)
    labels, ch = pipeline.refine_labels(
        "neargrid", ("changed", 2), rho_j, labels, tuple(w), tg,
        verbose=False, carry_in=carry or None)
    lab_fin = np.asarray(labels)
    print(f"refine: {time.perf_counter() - t0:.1f}s, changed {ch}")

    # id matching via basin maxima
    mx_ref = basin_maxima(lab_ref, rho, nm_ref)
    key = lambda m: (m[:, 0].astype(np.int64) * shape[1] + m[:, 1]) \
        * shape[2] + m[:, 2]  # noqa: E731
    ref_by_max = dict(zip(key(mx_ref).tolist(), range(nm_ref)))
    perm = np.empty(nm_ref, dtype=np.int32)
    for hyb_id, kk in enumerate(key(np.asarray(maxima)).tolist()):
        perm[ref_by_max[kk]] = hyb_id
    lab_ref_m = perm[lab_ref]
    lab_tru_m = perm[lab_tru]
    for name, lab in (("band+refine vs serial@2", lab_ref_m),
                      ("band+refine vs TRUTH", lab_tru_m)):
        mm = int(np.sum(lab != lab_fin))
        print(f"{name}: {100.0 * mm / n:.4f}% voxels")
    mm0 = int(np.sum((lab_band != lab_tru_m)))
    print(f"band walk alone vs TRUTH: {100.0 * mm0 / n:.4f}% voxels")


if __name__ == "__main__":
    main()
