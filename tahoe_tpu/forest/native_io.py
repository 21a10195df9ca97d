"""ctypes binding for the native C++ text-format parser (csrc/loader.cpp).

The reference's loaders and model compiler are host C++ (BaseTahoeTest.h:267-402);
this is the framework's native-runtime counterpart. Python stays the fallback
and format-of-record (io.py); the C++ path exists because the 15 reference
datasets are millions of text lines (SUSY: 500 trees x 511 nodes x 5 lines)
and numpy's loadtxt is ~20x slower than the mmap strtod scanner.

Build: ``make -C csrc`` → csrc/libtahoe_io.so (done automatically on first
use if a compiler is available).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from tahoe_tpu.config import tree_num_nodes

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libtahoe_io.so"))

_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_CSRC)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.tahoe_model_header.restype = ctypes.c_int
    lib.tahoe_model_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.tahoe_model_load.restype = ctypes.c_int
    lib.tahoe_model_load.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.tahoe_data_header.restype = ctypes.c_int
    lib.tahoe_data_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.tahoe_data_load.restype = ctypes.c_int
    lib.tahoe_data_load.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def load_model(path: str) -> Optional[Tuple[int, int, np.ndarray]]:
    """Returns (num_trees, depth, table [nodes, 5] f64-compatible) or None.

    Table columns mirror the text order: fid, value, def_left, weight, is_leaf
    (the layout io._model_from_table expects).
    """
    lib = _get_lib()
    if lib is None:
        return None
    nt = ctypes.c_int64()
    dp = ctypes.c_int64()
    if lib.tahoe_model_header(path.encode(), ctypes.byref(nt), ctypes.byref(dp)) != 0:
        raise IOError(f"cannot read model file {path}")
    num_trees, depth = int(nt.value), int(dp.value)
    n = num_trees * tree_num_nodes(depth)
    fids = np.empty(n, np.int32)
    values = np.empty(n, np.float32)
    def_left = np.empty(n, np.uint8)
    weights = np.empty(n, np.float32)
    is_leaf = np.empty(n, np.uint8)
    rc = lib.tahoe_model_load(
        path.encode(), n,
        _ptr(fids, ctypes.c_int32), _ptr(values, ctypes.c_float),
        _ptr(def_left, ctypes.c_uint8), _ptr(weights, ctypes.c_float),
        _ptr(is_leaf, ctypes.c_uint8),
    )
    if rc != 0:
        raise IOError(f"model file {path} truncated or malformed (rc={rc})")
    table = np.empty((n, 5), np.float64)
    table[:, 0] = fids
    table[:, 1] = values
    table[:, 2] = def_left
    table[:, 3] = weights
    table[:, 4] = is_leaf
    return num_trees, depth, table


def load_data(path: str) -> Optional[Tuple[np.ndarray, float]]:
    lib = _get_lib()
    if lib is None:
        return None
    nr = ctypes.c_int64()
    nc = ctypes.c_int64()
    miss = ctypes.c_double()
    if lib.tahoe_data_header(
        path.encode(), ctypes.byref(nr), ctypes.byref(nc), ctypes.byref(miss)
    ) != 0:
        raise IOError(f"cannot read data file {path}")
    rows, cols = int(nr.value), int(nc.value)
    out = np.empty(rows * cols, np.float32)
    rc = lib.tahoe_data_load(path.encode(), rows * cols, _ptr(out, ctypes.c_float))
    if rc != 0:
        raise IOError(f"data file {path} truncated or malformed (rc={rc})")
    return out.reshape(rows, cols), float(miss.value)
