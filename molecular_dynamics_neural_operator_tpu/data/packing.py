"""ctypes bindings to the native batch-packing library (csrc/packing.cpp).

The library is built lazily on first use (``make -C csrc``) and cached; if
the toolchain or build fails, callers fall back to the numpy paths in
``data/windows.py``. The reference has no native tier at all (SURVEY.md
section 2: zero C++/CUDA components) — this is the framework's host-side
runtime complement to the Pallas/XLA device tier.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libmdno_packing.so"
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_CSRC)], check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        i64 = ctypes.c_int64
        p = ctypes.POINTER
        lib.pack_dense_batch.argtypes = [
            p(ctypes.c_int32), i64, p(i64), p(i64), i64, i64,
            p(ctypes.c_float),
        ]
        lib.pack_dense_batch.restype = None
        lib.pack_padded_batch.argtypes = [
            p(ctypes.c_int32), i64, p(i64), p(i64), i64, i64,
            p(ctypes.c_int32), p(ctypes.c_float),
        ]
        lib.pack_padded_batch.restype = i64
        lib.gather_windows.argtypes = [
            p(ctypes.c_float), i64, p(i64), i64, i64, p(ctypes.c_float),
        ]
        lib.gather_windows.restype = None
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pack_dense_batch(edges_flat: np.ndarray, offsets: np.ndarray,
                     idx: np.ndarray, r: int) -> Optional[np.ndarray]:
    """Native densify; returns None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    edges_flat = np.ascontiguousarray(edges_flat, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx), r, r), np.float32)
    lib.pack_dense_batch(
        _ptr(edges_flat, ctypes.c_int32), edges_flat.shape[1],
        _ptr(offsets, ctypes.c_int64), _ptr(idx, ctypes.c_int64),
        len(idx), r, _ptr(out, ctypes.c_float),
    )
    return out


def pack_padded_batch(edges_flat: np.ndarray, offsets: np.ndarray,
                      idx: np.ndarray, e_max: int):
    """Native padded edge lists; returns None if unavailable. Raises on
    capacity overflow like the numpy path."""
    lib = _load()
    if lib is None:
        return None
    edges_flat = np.ascontiguousarray(edges_flat, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    idx = np.ascontiguousarray(idx, np.int64)
    edges = np.empty((len(idx), 2, e_max), np.int32)
    mask = np.empty((len(idx), e_max), np.float32)
    max_count = lib.pack_padded_batch(
        _ptr(edges_flat, ctypes.c_int32), edges_flat.shape[1],
        _ptr(offsets, ctypes.c_int64), _ptr(idx, ctypes.c_int64),
        len(idx), e_max, _ptr(edges, ctypes.c_int32),
        _ptr(mask, ctypes.c_float),
    )
    if max_count > e_max:
        raise ValueError(
            f"stored edge count {max_count} exceeds max_edges {e_max}"
        )
    return edges, mask


def gather_windows(positions: np.ndarray, idx: np.ndarray,
                   window: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    r = positions.shape[1]
    out = np.empty((len(idx), window, r, 3), np.float32)
    lib.gather_windows(
        _ptr(positions, ctypes.c_float), r, _ptr(idx, ctypes.c_int64),
        len(idx), window, _ptr(out, ctypes.c_float),
    )
    return out
