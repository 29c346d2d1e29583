"""Label parity of the native serial baselines against the numpy oracle.

native/serial_neargrid.cpp grounds the DEFAULT-workload performance
baseline (reference neargrid + 'changed'-mode refinement, serial); these
tests pin it voxel-for-voxel to the clean-room spec in tests/oracle.py so
the timing anchor measures the *reference semantics*, not an approximation.
native/serial_baseline.cpp (the ongrid headline anchor) is pinned the same
way.
"""
import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np
import pytest

from tests.oracle import neargrid_oracle, ongrid_oracle, refine_oracle
from tests.test_ongrid import LATTICE, SHAPE, make_density

from pybader_tpu import grid as g

_NATIVE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.pardir, "native")


def _load(src_name):
    src = os.path.abspath(os.path.join(_NATIVE, src_name))
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    lib_path = os.path.join(
        tempfile.gettempdir(),
        f"pybader-test-{os.path.splitext(src_name)[0]}-{digest}.so")
    if not os.path.isfile(lib_path):
        tmp = lib_path + f".tmp{os.getpid()}"
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True, timeout=180)
        except (OSError, subprocess.SubprocessError) as e:
            pytest.skip(f"native toolchain unavailable: {e}")
        os.replace(tmp, lib_path)
    return ctypes.CDLL(lib_path)


@pytest.fixture(scope="module")
def libng():
    lib = _load("serial_neargrid.cpp")
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.sn_neargrid.restype = ctypes.c_long
    lib.sn_neargrid.argtypes = [dp] + [ctypes.c_long] * 3 + [dp, dp, ip]
    lib.sn_refine.restype = ctypes.c_long
    lib.sn_refine.argtypes = (
        [dp] + [ctypes.c_long] * 3 + [dp, dp, ip, ctypes.c_long])
    return lib


def _setup(seed):
    rho = np.ascontiguousarray(make_density(seed))
    w = np.ascontiguousarray(g.distance_weights(LATTICE, SHAPE))
    tg = np.ascontiguousarray(g.t_grad(LATTICE, SHAPE))
    return rho, w, tg


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


@pytest.mark.parametrize("seed", [0, 1, 4])
def test_native_neargrid_matches_oracle(libng, seed):
    rho, w, tg = _setup(seed)
    labels = np.empty(SHAPE, dtype=np.int32)
    nm = libng.sn_neargrid(
        _dp(rho), *SHAPE, _dp(w), _dp(tg),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    lab_o, maxima_o = neargrid_oracle(rho, w, tg)
    assert nm == len(maxima_o)
    np.testing.assert_array_equal(labels, lab_o)


@pytest.mark.parametrize("seed,iters", [(0, 2), (1, -1), (4, 2)])
def test_native_refine_matches_oracle(libng, seed, iters):
    rho, w, tg = _setup(seed)
    lab0, _ = neargrid_oracle(rho, w, tg)
    lab_c = np.ascontiguousarray(lab0.copy())
    ch_c = libng.sn_refine(
        _dp(rho), *SHAPE, _dp(w), _dp(tg),
        lab_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_long(iters))
    lab_o, ch_o = refine_oracle(rho, w, tg, lab0, "changed", iters)
    assert ch_c == ch_o
    np.testing.assert_array_equal(lab_c, lab_o)


def test_native_ongrid_matches_oracle():
    lib = _load("serial_baseline.cpp")
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.so_partition.restype = ctypes.c_long
    lib.so_partition.argtypes = [dp] + [ctypes.c_long] * 3 + [dp, ip]
    rho, w, tg = _setup(2)
    labels = np.empty(SHAPE, dtype=np.int32)
    nm = lib.so_partition(
        _dp(rho), *SHAPE, _dp(w),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    lab_o, maxima_o = ongrid_oracle(rho, w)
    assert nm == len(maxima_o)
    np.testing.assert_array_equal(labels, lab_o)
