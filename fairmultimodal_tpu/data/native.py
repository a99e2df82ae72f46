"""ctypes bindings for the native (C++) ETL components.

``aggregate_events_native`` streams a MIMIC event ``csv.gz`` through
``native/fastetl`` (see ``native/fastetl/fastetl.cc``) and returns the
(subject, hadm, bin, itemid) -> value aggregation as numpy arrays — a
drop-in, order-insensitive replacement for the pandas groupby in
``data/etl.py`` (reference 00_data.py:200-256).

``clean_and_chunk_native`` runs the unstructured-notes cleanup + 512-token
chunking (reference 00_data.py:395-439) through ``native/fastnotes`` — the
other ETL hot loop (seven sequential regex passes over every patient's
concatenated note text, then whitespace chunking, via pandas ``.apply`` in
the fallback path).  Only ASCII documents take the native path (Python's
str.lower/strip/split are unicode-aware; MIMIC notes are ASCII); any
non-ASCII document silently falls back to the Python functions per-doc, so
results are identical either way (fuzzed in tests/test_native.py).

The libraries are built on demand with ``make -C native`` (g++ + zlib only);
:func:`available` / :func:`notes_available` report whether each shared
object could be loaded so callers can fall back to pandas.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["available", "notes_available", "build", "aggregate_events_native",
           "clean_and_chunk_native"]

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
    try:
        lib.fastetl_rows_scanned.restype = ctypes.c_int64
        lib.fastetl_rows_scanned.argtypes = [ctypes.c_void_p]
    except AttributeError:
        pass  # stale pre-round-5 .so; rows_scanned reporting degrades to 0
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


_NOTES_LIB_PATH = os.path.join(_NATIVE_DIR, "lib", "libfastnotes.so")
_notes_lib: Optional[ctypes.CDLL] = None


def _load_notes() -> Optional[ctypes.CDLL]:
    global _notes_lib
    if _notes_lib is not None:
        return _notes_lib
    if not os.path.exists(_NOTES_LIB_PATH):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_NOTES_LIB_PATH)
    except OSError:
        return None
    lib.fastnotes_clean.restype = ctypes.c_void_p
    lib.fastnotes_clean.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int,
    ]
    for name in ("fastnotes_buf_size", "fastnotes_n_chunks",
                 "fastnotes_clean_buf_size"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    lib.fastnotes_fill.restype = None
    lib.fastnotes_fill.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fastnotes_free.restype = None
    lib.fastnotes_free.argtypes = [ctypes.c_void_p]
    _notes_lib = lib
    return _notes_lib


def notes_available() -> bool:
    return _load_notes() is not None


def clean_and_chunk_native(
    texts: List[str],
    chunk_size: int = 512,
) -> Tuple[List[str], List[List[str]]]:
    """Cleaned text + 512-token chunks per document.

    Bit-identical to the Python chain in ``data/etl.py::build_unstructured``
    (newline/CR -> space, strip, lower, ``clean_note_text``,
    ``split_text_to_chunks``); non-ASCII documents are routed through those
    Python functions directly so unicode semantics never diverge.
    """
    lib = _load_notes()
    if lib is None:
        raise RuntimeError("native fastnotes library unavailable (build failed)")
    from fairmultimodal_tpu.data.etl import clean_note_text, split_text_to_chunks

    n = len(texts)
    cleaned: List[Optional[str]] = [None] * n
    chunks: List[Optional[List[str]]] = [None] * n

    native_idx = []
    enc: List[bytes] = []
    for i, t in enumerate(texts):
        t = "" if t is None else str(t)
        if t.isascii():
            native_idx.append(i)
            enc.append(t.encode("ascii"))
        else:
            y = t.replace("\n", " ").replace("\r", " ").strip().lower()
            y = clean_note_text(y)
            cleaned[i] = y
            chunks[i] = split_text_to_chunks(y, chunk_size)

    if native_idx:
        offsets = np.zeros(len(enc) + 1, np.int64)
        np.cumsum([len(b) for b in enc], out=offsets[1:])
        buf = b"".join(enc)
        err = ctypes.create_string_buffer(256)
        handle = lib.fastnotes_clean(
            buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(enc), chunk_size, err, len(err))
        if not handle:
            raise RuntimeError(
                f"fastnotes: {err.value.decode() or 'unknown error'}")
        try:
            out_n = lib.fastnotes_buf_size(handle)
            n_chunks = lib.fastnotes_n_chunks(handle)
            clean_n = lib.fastnotes_clean_buf_size(handle)
            out_buf = ctypes.create_string_buffer(max(out_n, 1))
            clean_buf = ctypes.create_string_buffer(max(clean_n, 1))
            chunk_off = np.empty(n_chunks + 1, np.int64)
            doc_counts = np.empty(len(enc), np.int32)
            doc_off = np.empty(len(enc) + 1, np.int64)
            lib.fastnotes_fill(
                handle, out_buf,
                chunk_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                doc_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                clean_buf,
                doc_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        finally:
            lib.fastnotes_free(handle)
        raw_chunks = out_buf.raw
        raw_clean = clean_buf.raw
        c = 0
        for d, i in enumerate(native_idx):
            cleaned[i] = raw_clean[doc_off[d]:doc_off[d + 1]].decode("ascii")
            k = int(doc_counts[d])
            chunks[i] = [
                raw_chunks[chunk_off[c + j]:chunk_off[c + j + 1]].decode("ascii")
                for j in range(k)]
            c += k

    return cleaned, chunks  # type: ignore[return-value]


def aggregate_events_native(
    path: str,
    stay_subject: np.ndarray,
    stay_hadm: np.ndarray,
    stay_intime_epoch: np.ndarray,
    itemids: Optional[np.ndarray] = None,
    window_hours: float = 24.0,
    bin_hours: float = 2.0,
    agg: str = "mean",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Stream-aggregate one event table.

    Returns (subject_id, hadm_id, hour_bin, itemid, value, rows_scanned):
    the first five are arrays with one row per (subject, hadm, bin, itemid)
    group — the long form of the reference's ``groupby(...).agg(...)``
    (00_data.py:249-251); pivot on the caller side.  ``rows_scanned`` is the
    number of data lines streamed (throughput reporting; 0 with a stale
    pre-round-5 library).
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
        rows_scanned = (int(lib.fastetl_rows_scanned(handle))
                        if hasattr(lib, "fastetl_rows_scanned") else 0)
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
            out_item[order], out_val[order], rows_scanned)
