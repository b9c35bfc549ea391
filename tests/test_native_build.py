"""The C++ core must build from a clean tree (no committed binary —
native.py builds lazily via make; reference ships numba JIT instead,
empanada/array_utils.py)."""

import ctypes
import os
import shutil
import subprocess

import numpy as np

NATIVE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "empanada_tpu", "core", "_native")


def test_builds_from_clean_tree(tmp_path):
    for name in ("core.cpp", "Makefile"):
        shutil.copy(os.path.join(NATIVE_DIR, name), tmp_path / name)
    subprocess.run(["make", "-C", str(tmp_path), "-s"], check=True,
                   capture_output=True, timeout=120)
    so = tmp_path / "libetpu_core.so"
    assert so.exists()

    lib = ctypes.CDLL(str(so))
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.etpu_runs_ccl.restype = i64
    lib.etpu_runs_ccl.argtypes = [p64, p64, p64, i64, i64, i32, p32]

    # two runs on adjacent rows, overlapping columns -> one component
    starts = np.array([0, 10], np.int64)   # raveled, width 10
    ends = np.array([3, 13], np.int64)
    values = np.array([1, 1], np.int64)
    labels = np.zeros(2, np.int32)
    n = lib.etpu_runs_ccl(starts, ends, values, 2, 10, 8, labels)
    assert n == 1
    assert labels[0] == labels[1]
