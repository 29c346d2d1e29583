#!/usr/bin/env python
"""Hybrid accuracy at the SHIPPING config vs the serial reference.

VERDICT r3 missing #2: above 16M voxels the default pipeline substitutes
ongrid + bounded neargrid refinement for the reference's full neargrid
initial pass.  tests/test_hybrid_parity.py pins equivalence only at the
*converged* ground truth; this script measures the deviation at the actual
default config — refine_mode=('changed', 2), NOT converged — against
native/serial_neargrid.cpp (reference semantics: full neargrid initial
pass with label adoption, methods.py:222-611, + ('changed', 2) re-walks,
refinement.py:16-322; parity-pinned by tests/test_serial_native.py).

Both sides run the SAME host-f64 bench field (bench.synthetic_density).
Reported: basin-count match, % voxels labelled differently, and per-atom
|Δq| (voxel-volume-weighted charge sums, atoms = the blob centers) — the
BASELINE.md gate currency.  Results are recorded in BASELINE.md.

Usage:
    python _exp/hybrid_accuracy.py --size 128          # CPU backend
    PYTHONPATH=.:/root/.axon_site python _exp/hybrid_accuracy.py \
        --size 192                                      # TPU backend

Single-purpose measurement script; not part of the package.
"""
import argparse
import ctypes
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_serial():
    src = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "serial_neargrid.cpp")
    lib_path = os.path.join(tempfile.gettempdir(),
                            f"serial_neargrid-{os.getuid()}.so")
    if not os.path.isfile(lib_path) or (
            os.path.getmtime(src) > os.path.getmtime(lib_path)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", lib_path, src], check=True, timeout=180)
    lib = ctypes.CDLL(lib_path)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.sn_neargrid.restype = ctypes.c_long
    lib.sn_neargrid.argtypes = [dp] + [ctypes.c_long] * 3 + [dp, dp, ip]
    lib.sn_refine.restype = ctypes.c_long
    lib.sn_refine.argtypes = [dp] + [ctypes.c_long] * 3 + [dp, dp, ip,
                                                           ctypes.c_long]
    return lib


def atom_charges(labels, maxima_xyz, rho, shape, lattice, atoms_cart,
                 vox_vol):
    """per-atom charge sums for one labelling (maxima -> nearest atom)."""
    import jax.numpy as jnp

    from pybader_tpu.ops import atoms as atoms_ops
    from pybader_tpu.ops import reductions

    mx_cart = (np.asarray(maxima_xyz) / np.asarray(shape)) @ lattice
    atom_of_max, _ = atoms_ops.assign_to_atoms(
        jnp.asarray(mx_cart), jnp.asarray(atoms_cart), jnp.asarray(lattice))
    atoms_volumes = reductions.relabel(jnp.asarray(labels),
                                       jnp.asarray(atom_of_max))
    charge, _ = reductions.charge_volume_sum(
        jnp.asarray(rho), atoms_volumes, vox_vol, len(atoms_cart))
    return np.asarray(charge)


def basin_maxima(labels, rho, n):
    """per-basin maximum voxel (xyz int array, (n, 3)) of a labelling."""
    flat_lab = labels.reshape(-1)
    order = np.lexsort((-rho.reshape(-1), flat_lab))
    first = np.searchsorted(flat_lab[order], np.arange(n))
    mx_flat = order[first]
    ny, nz = labels.shape[1], labels.shape[2]
    return np.stack([mx_flat // (ny * nz), (mx_flat // nz) % ny,
                     mx_flat % nz], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--backend", choices=["cpu", "device"], default="cpu",
                    help="cpu = semantics-level deviation; device = the "
                         "shipping TPU path (adds f32-row knife edges)")
    ap.add_argument("--truth", action="store_true",
                    help="also converge the serial refinement (iters=-1) "
                         "and report both sides' distance to that fixed "
                         "point — is the hybrid default closer to the "
                         "ground truth than the reference's own default?")
    ap.add_argument("--serial-cache", default=None,
                    help="npz path: load the serial-side labels from it "
                         "if present, else compute and save them there "
                         "(the serial side is minutes-class at 384^3 on "
                         "one core; the device side re-runs cheaply)")
    ap.add_argument("--serial-only", action="store_true",
                    help="compute + cache the serial side, then exit "
                         "(run it while the TPU is busy elsewhere)")
    ap.add_argument("--full-trajectories", action="store_true",
                    help="run the exact full-trajectory initial pass "
                         "instead of the hybrid (the reference-semantics "
                         "mode; measures its cost AND verifies parity at "
                         "sizes where the hybrid normally substitutes)")
    args = ap.parse_args()

    if args.backend == "cpu":
        # the container pins JAX_PLATFORMS=axon via sitecustomize; override
        # in-process like tests/conftest.py does
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # device runs MUST reuse the persistent XLA cache: remote compiles
        # through the axon tunnel cost 1-5 min per program, and the
        # default pipeline dispatches dozens (measured: without this the
        # 384^3 device comparison sat >25 min in compiles bench.py had
        # already paid for)
        from pybader_tpu.precompile import enable_persistent_cache

        enable_persistent_cache()

    from bench import synthetic_density

    size = args.size
    shape = (size, size, size)
    n = size ** 3
    lattice = np.diag([20.0] * 3)

    t0 = time.perf_counter()
    rho, centers = synthetic_density(shape, return_centers=True)
    rho = np.ascontiguousarray(rho)
    atoms_cart = centers @ lattice
    print(f"field: {time.perf_counter() - t0:.1f}s")

    from pybader_tpu import grid
    w = np.ascontiguousarray(grid.distance_weights(lattice, shape))
    tg = np.ascontiguousarray(grid.t_grad(lattice, shape))
    vox_vol = grid.voxel_volume(lattice, shape)

    # ---- serial reference semantics
    dp = ctypes.POINTER(ctypes.c_double)
    cache = args.serial_cache
    lab_tru = None
    if cache and os.path.isfile(cache):
        z = np.load(cache)
        lab_ref = np.ascontiguousarray(z["lab_ref"])
        nm_ref = int(z["nm_ref"])
        if "lab_tru" in z.files:
            lab_tru = np.ascontiguousarray(z["lab_tru"])
        print(f"serial (cached {cache}): {nm_ref} basins"
              f"{', truth cached' if lab_tru is not None else ''}")
    else:
        lib = build_serial()
        lab_ref = np.empty(shape, dtype=np.int32)
        t0 = time.perf_counter()
        nm_ref = lib.sn_neargrid(
            rho.ctypes.data_as(dp), *shape, w.ctypes.data_as(dp),
            tg.ctypes.data_as(dp),
            lab_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        t_init = time.perf_counter() - t0
        t0 = time.perf_counter()
        ch_ref = lib.sn_refine(
            rho.ctypes.data_as(dp), *shape, w.ctypes.data_as(dp),
            tg.ctypes.data_as(dp),
            lab_ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_long(args.iters))
        t_ref = time.perf_counter() - t0
        print(f"serial: {nm_ref} basins, init {t_init:.1f}s, "
              f"refine({args.iters}) {t_ref:.1f}s, changed {ch_ref}")
        if args.truth:
            lab_tru = np.ascontiguousarray(lab_ref.copy())
            t0 = time.perf_counter()
            lib.sn_refine(
                rho.ctypes.data_as(dp), *shape, w.ctypes.data_as(dp),
                tg.ctypes.data_as(dp),
                lab_tru.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                ctypes.c_long(-1))
            print(f"serial converged (truth): "
                  f"+{time.perf_counter() - t0:.0f}s")
        if cache:
            payload = {"lab_ref": lab_ref, "nm_ref": nm_ref}
            if lab_tru is not None:
                payload["lab_tru"] = lab_tru
            np.savez_compressed(cache, **payload)
            print(f"serial side cached -> {cache}")
    if args.serial_only:
        return

    # ---- shipping pipeline config (hybrid + chained user refinement)
    from pybader_tpu import pipeline
    t0 = time.perf_counter()
    carry = {}
    labels, maxima = pipeline.partition_neargrid(
        rho, None, tuple(w), tg,
        full_trajectories=args.full_trajectories, carry_out=carry)
    t_init = time.perf_counter() - t0
    labels, ch_hyb = pipeline.refine_labels(
        "neargrid", ("changed", args.iters), rho, labels, tuple(w), tg,
        verbose=False, carry_in=carry or None)
    lab_hyb = np.asarray(labels)
    name = "full-trajectory" if args.full_trajectories else "hybrid"
    print(f"{name} pipeline: {len(maxima)} basins, "
          f"{time.perf_counter() - t0:.1f}s (init {t_init:.1f}s), "
          f"changed {ch_hyb}")

    # ---- compare: remap serial ids -> hybrid ids via basin maxima
    assert nm_ref == len(maxima), (nm_ref, len(maxima))
    mx_ref = basin_maxima(lab_ref, rho, nm_ref)
    key = lambda m: (m[:, 0].astype(np.int64) * shape[1] + m[:, 1]) \
        * shape[2] + m[:, 2]  # noqa: E731
    ref_by_max = dict(zip(key(mx_ref).tolist(), range(nm_ref)))
    perm = np.empty(nm_ref, dtype=np.int32)  # serial id -> hybrid id
    matched = 0
    for hyb_id, k in enumerate(key(np.asarray(maxima)).tolist()):
        if k in ref_by_max:
            perm[ref_by_max[k]] = hyb_id
            matched += 1
    print(f"maxima matched by position: {matched}/{nm_ref}")
    assert matched == nm_ref, "basin maxima disagree; remap invalid"
    lab_ref_mapped = perm[lab_ref]

    mism = int(np.sum(lab_ref_mapped != lab_hyb))
    print(f"voxels differing: {mism} / {n} ({100.0 * mism / n:.4f}%)")

    q_ref = atom_charges(lab_ref_mapped, mx_ref[np.argsort(perm)], rho,
                         shape, lattice, atoms_cart, vox_vol)
    q_hyb = atom_charges(lab_hyb, maxima, rho, shape, lattice, atoms_cart,
                         vox_vol)
    total = float(np.sum(rho) * vox_vol)
    dq = np.abs(q_ref - q_hyb)
    print(f"total charge: {total:.6e} (ref sums {np.sum(q_ref):.6e}, "
          f"hybrid {np.sum(q_hyb):.6e})")
    print(f"per-atom |dq|: max {dq.max():.3e}, sum {dq.sum():.3e} "
          f"({100.0 * dq.max() / total:.2e}% / {100.0 * dq.sum() / total:.2e}% of total)")

    if lab_tru is not None:
        lab_tru_m = perm[lab_tru]
        q_tru = atom_charges(lab_tru_m, maxima, rho, shape, lattice,
                             atoms_cart, vox_vol)
        for name, lab, q in (("serial default", lab_ref_mapped, q_ref),
                             ("hybrid default", lab_hyb, q_hyb)):
            mm = int(np.sum(lab != lab_tru_m))
            dd = np.abs(q - q_tru)
            print(f"{name} vs TRUTH: {100.0 * mm / n:.4f}% voxels, "
                  f"max|dq| {dd.max():.3e} "
                  f"({100.0 * dd.max() / total:.2e}% of total)")


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
