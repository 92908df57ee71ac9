"""ctypes bindings for the native C++ host components.

Builds lazily on first import (g++ is in the image; pybind11 is not, so the
ABI is plain C consumed via ctypes).  Every entry point has a pure-python
fallback at its call site — a missing toolchain degrades performance, not
capability.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cpp")
_LIB = os.path.join(_DIR, "libalbatross_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    # ALBATROSS_NATIVE_LIB points at an alternate build (the CI sanitizer
    # lane loads an ASan/UBSan-instrumented .so through the same bindings)
    override = os.environ.get("ALBATROSS_NATIVE_LIB")
    lib_path = override or _LIB
    if not override and (
        not os.path.exists(_LIB)
        or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        _build()
    lib = ctypes.CDLL(lib_path)
    lib.csv_open.restype = ctypes.c_void_p
    lib.csv_open.argtypes = [ctypes.c_char_p]
    lib.csv_num_cols.restype = ctypes.c_int64
    lib.csv_num_cols.argtypes = [ctypes.c_void_p]
    lib.csv_num_rows.restype = ctypes.c_int64
    lib.csv_num_rows.argtypes = [ctypes.c_void_p]
    lib.csv_header.restype = ctypes.c_char_p
    lib.csv_header.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.csv_copy_column.restype = None
    lib.csv_copy_column.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.csv_free.restype = None
    lib.csv_free.argtypes = [ctypes.c_void_p]
    lib.mst_kruskal.restype = ctypes.c_int64
    lib.mst_kruskal.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def parse_csv(path: str) -> Dict[str, np.ndarray]:
    """Numeric CSV -> {column name: float64 array} via the C++ parser."""
    lib = _load()
    handle = lib.csv_open(path.encode())
    if not handle:
        raise IOError(f"could not open {path}")
    try:
        ncols = lib.csv_num_cols(handle)
        nrows = lib.csv_num_rows(handle)
        out: Dict[str, np.ndarray] = {}
        for i in range(ncols):
            name = lib.csv_header(handle, i).decode()
            col = np.empty(nrows, dtype=np.float64)
            lib.csv_copy_column(
                handle, i, col.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
            )
            out[name] = col
        return out
    finally:
        lib.csv_free(handle)


def mst_kruskal(a, b, cost) -> np.ndarray:
    """Edge-selection mask of the minimum spanning tree (C++ Kruskal)."""
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.int64)
    b = np.ascontiguousarray(b, dtype=np.int64)
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    mask = np.zeros(a.shape[0], dtype=np.uint8)
    lib.mst_kruskal(
        a.shape[0],
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool)
