"""ctypes bindings for the native (C++) ETL components.

``aggregate_events_native`` streams a MIMIC event ``csv.gz`` through
``native/fastetl`` (see ``native/fastetl/fastetl.cc``) and returns the
(subject, hadm, bin, itemid) -> value aggregation as numpy arrays — a
drop-in, order-insensitive replacement for the pandas groupby in
``data/etl.py`` (reference 00_data.py:200-256).  The library is built on
demand with ``make -C native`` (g++ + zlib only); :func:`available` reports
whether the shared object could be loaded so callers can fall back to pandas.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "build", "aggregate_events_native"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "lib", "libfastetl.so")

_lib: Optional[ctypes.CDLL] = None


def build(quiet: bool = True) -> bool:
    """Compile the native library (idempotent). Returns success."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            stdout=subprocess.DEVNULL if quiet else None,
            stderr=subprocess.DEVNULL if quiet else None,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fastetl_aggregate.restype = ctypes.c_void_p
    lib.fastetl_aggregate.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.fastetl_size.restype = ctypes.c_int64
    lib.fastetl_size.argtypes = [ctypes.c_void_p]
    lib.fastetl_fill.restype = None
    lib.fastetl_fill.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.fastetl_free.restype = None
    lib.fastetl_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def aggregate_events_native(
    path: str,
    stay_subject: np.ndarray,
    stay_hadm: np.ndarray,
    stay_intime_epoch: np.ndarray,
    itemids: Optional[np.ndarray] = None,
    window_hours: float = 24.0,
    bin_hours: float = 2.0,
    agg: str = "mean",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Stream-aggregate one event table.

    Returns (subject_id, hadm_id, hour_bin, itemid, value) arrays, one row per
    (subject, hadm, bin, itemid) group — the long form of the reference's
    ``groupby(...).agg(...)`` (00_data.py:249-251); pivot on the caller side.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastetl library unavailable (build failed)")
    subj = np.ascontiguousarray(stay_subject, np.int64)
    hadm = np.ascontiguousarray(stay_hadm, np.int64)
    intime = np.ascontiguousarray(stay_intime_epoch, np.float64)
    items = np.ascontiguousarray(
        itemids if itemids is not None else np.zeros(0), np.int64)
    err = ctypes.create_string_buffer(512)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    handle = lib.fastetl_aggregate(
        path.encode(), ptr(subj, ctypes.c_int64), ptr(hadm, ctypes.c_int64),
        ptr(intime, ctypes.c_double), len(subj),
        ptr(items, ctypes.c_int64), len(items),
        float(window_hours), float(bin_hours),
        1 if agg == "sum" else 0, err, len(err))
    if not handle:
        raise RuntimeError(f"fastetl: {err.value.decode() or 'unknown error'}")
    try:
        n = lib.fastetl_size(handle)
        out_subj = np.empty(n, np.int64)
        out_hadm = np.empty(n, np.int64)
        out_bin = np.empty(n, np.int32)
        out_item = np.empty(n, np.int64)
        out_val = np.empty(n, np.float64)
        if n:
            lib.fastetl_fill(handle, ptr(out_subj, ctypes.c_int64),
                             ptr(out_hadm, ctypes.c_int64),
                             ptr(out_bin, ctypes.c_int32),
                             ptr(out_item, ctypes.c_int64),
                             ptr(out_val, ctypes.c_double))
    finally:
        lib.fastetl_free(handle)
    order = np.lexsort((out_item, out_bin, out_hadm, out_subj))
    return (out_subj[order], out_hadm[order], out_bin[order],
            out_item[order], out_val[order])
