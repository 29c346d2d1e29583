#!/usr/bin/env python
"""Serial CPU anchor for the DEFAULT workload (neargrid + refinement).

Builds native/serial_neargrid.cpp, runs the reference-semantics serial
neargrid initial pass and 'changed'-mode refinement on the bench field
(bench.synthetic_density) at the requested size, and reports stage
wall-clock — the measurements BASELINE.md's default-workload anchor table
records.  Optionally dumps the resulting label grid so the TPU pipeline's
output can be compared at the shipping config (VERDICT r3 missing #2).

Usage:
    python _exp/serial_default.py --size 128 [--iters 2] [--save out.npy]

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


def build():
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=2,
                    help="refinement iterations (<0 = converge); default "
                         "matches the shipping config ('changed', 2)")
    ap.add_argument("--save", type=str, default=None,
                    help="save final labels (int32 .npy)")
    args = ap.parse_args()

    from bench import synthetic_density
    from pybader_tpu import grid

    lib = build()
    shape = (args.size,) * 3
    lattice = np.diag([20.0] * 3)
    t0 = time.perf_counter()
    rho = synthetic_density(shape)
    print(f"field {args.size}^3 built in {time.perf_counter() - t0:.1f}s")
    w = np.asarray(grid.distance_weights(lattice, shape), dtype=np.float64)
    tg = np.asarray(grid.t_grad(lattice, shape), dtype=np.float64)
    labels = np.empty(shape, dtype=np.int32)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)

    t0 = time.perf_counter()
    nm = lib.sn_neargrid(rho.ctypes.data_as(dp), *shape,
                         w.ctypes.data_as(dp), tg.ctypes.data_as(dp),
                         labels.ctypes.data_as(ip))
    t_init = time.perf_counter() - t0
    n = int(np.prod(shape))
    print(f"neargrid initial pass: {t_init:.2f}s "
          f"({n / t_init / 1e6:.2f} Mvox/s), {nm} maxima")

    t0 = time.perf_counter()
    changed = lib.sn_refine(rho.ctypes.data_as(dp), *shape,
                            w.ctypes.data_as(dp), tg.ctypes.data_as(dp),
                            labels.ctypes.data_as(ip), args.iters)
    t_ref = time.perf_counter() - t0
    print(f"refinement ('changed', {args.iters}): {t_ref:.2f}s, "
          f"{changed} voxels changed")
    print(f"default total: {t_init + t_ref:.2f}s "
          f"({n / (t_init + t_ref) / 1e6:.2f} Mvox/s; "
          f"x8 assumed = {(t_init + t_ref) / 8:.2f}s)")
    if args.save:
        np.save(args.save, labels)
        print(f"labels -> {args.save}")


if __name__ == "__main__":
    main()
