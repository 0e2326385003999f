"""Build + ctypes-load the native filter library.

The reference ships its native filter as a SWIG extension built by hand
(utils/bilateralfilter/setup.py + README build steps); here the library
compiles on first use into the package directory and binds through the
plain C ABI — no SWIG, no install step.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gaussian_filter.cpp")
_LIB = os.path.join(_DIR, "libcosa_native.so")
_LOCK = threading.Lock()
_CACHED: Optional[ctypes.CDLL] = None


def _compile() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_native(rebuild: bool = False) -> ctypes.CDLL:
    global _CACHED
    with _LOCK:
        if _CACHED is not None and not rebuild:
            return _CACHED
        if rebuild or not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _compile()
        lib = ctypes.CDLL(_LIB)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.cosa_exact_gaussian.argtypes = [fp, fp, fp] + [ctypes.c_int] * 3
        lib.cosa_lattice_gaussian.argtypes = [fp, fp, fp] + [ctypes.c_int] * 3
        lib.cosa_lattice_gaussian_batch.argtypes = [fp, fp, fp] + [ctypes.c_int] * 4
        _CACHED = lib
        return lib


def _call(fname: str, feats: np.ndarray, vals: np.ndarray) -> np.ndarray:
    lib = load_native()
    feats = np.ascontiguousarray(feats, np.float32)
    vals = np.ascontiguousarray(vals, np.float32)
    n, d = feats.shape
    k = vals.shape[1]
    out = np.zeros_like(vals)
    fp = ctypes.POINTER(ctypes.c_float)
    getattr(lib, fname)(
        feats.ctypes.data_as(fp), vals.ctypes.data_as(fp),
        out.ctypes.data_as(fp), n, d, k,
    )
    return out


def exact_gaussian_cpu(feats: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """(N, d) x (N, K) exact Gaussian transform on the host (OpenMP)."""
    return _call("cosa_exact_gaussian", feats, vals)


def lattice_gaussian_cpu(feats: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """(N, d) x (N, K) permutohedral transform on the host (OpenMP)."""
    return _call("cosa_lattice_gaussian", feats, vals)


def lattice_gaussian_batch_cpu(feats: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """(B, N, d) x (B, N, K) batched lattice, OpenMP across the batch."""
    lib = load_native()
    feats = np.ascontiguousarray(feats, np.float32)
    vals = np.ascontiguousarray(vals, np.float32)
    b, n, d = feats.shape
    k = vals.shape[2]
    out = np.zeros_like(vals)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.cosa_lattice_gaussian_batch(
        feats.ctypes.data_as(fp), vals.ctypes.data_as(fp),
        out.ctypes.data_as(fp), b, n, d, k,
    )
    return out
