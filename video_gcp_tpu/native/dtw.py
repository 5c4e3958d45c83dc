"""ctypes bindings for the native batched DTW library, with numpy fallback.

Mirrors the reference's import pattern — fast native path, pure-python
fallback (gcp/evaluation/evaluation_matching.py:9-15). The library is built
on first use (g++ -O3 -fopenmp) and cached next to the source.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "dtw_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libdtw_native.so")


def _build():
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.min_cumsum_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.dtw_traceback_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def _pad(C: np.ndarray) -> np.ndarray:
    b, r, c = C.shape
    D = np.zeros((b, r + 1, c + 1), dtype=np.float64)
    D[:, 0, 1:] = np.inf
    D[:, 1:, 0] = np.inf
    D[:, 1:, 1:] = C
    return D


def min_cumsum(C: np.ndarray) -> np.ndarray:
    """Batched accumulated-cost matrix, native if possible.
    :param C: [B, r, c] cost matrix. :return: [B, r+1, c+1] padded D."""
    C = np.ascontiguousarray(C, dtype=np.float64)
    b, r, c = C.shape
    D = _pad(C)
    try:
        lib = get_lib()
        lib.min_cumsum_batch(
            D.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), b, r, c
        )
        return D
    except Exception:
        for i in range(r):
            for j in range(c):
                D[:, i + 1, j + 1] += np.minimum(
                    np.minimum(D[:, i, j], D[:, i + 1, j]), D[:, i, j + 1]
                )
        return D


def batched_dtw_alignment(C: np.ndarray, end_inds: np.ndarray):
    """Host-side equivalent of ops.dtw.batched_dtw_alignment.
    :return: (inds [B, c] int64, dist [B] float64)."""
    C = np.ascontiguousarray(C, dtype=np.float64)
    b, r, c = C.shape
    end_inds = np.ascontiguousarray(end_inds, dtype=np.int64)
    D = min_cumsum(C)
    inds = np.zeros((b, c), dtype=np.int64)
    dist = np.zeros((b,), dtype=np.float64)
    lib = get_lib()
    lib.dtw_traceback_batch(
        D.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        end_inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, r, c,
        inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return inds, dist
