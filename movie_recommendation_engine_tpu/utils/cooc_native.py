"""ctypes bridge to the native co-occurrence counter (cpp/cooc.cc).

Same build-on-first-use pattern as ingest_native; callers treat any exception
as "use the numpy path" (graph/builders.build_item_similarity_graph).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "cpp", "cooc.cc")
_SO = os.path.join(os.path.dirname(__file__), "_cooc_native.so")


def _build() -> str:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             src, "-o", _SO],
            check=True, capture_output=True,
        )
    return _SO


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        lib.cooc_count.restype = ctypes.c_void_p
        lib.cooc_count.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
        ]
        lib.cooc_num_edges.restype = ctypes.c_longlong
        lib.cooc_num_edges.argtypes = [ctypes.c_void_p]
        lib.cooc_fill.restype = None
        lib.cooc_fill.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        lib.cooc_free.restype = None
        lib.cooc_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def count_cooccurrence(
    user_idx_sorted: np.ndarray,
    movie_idx: np.ndarray,
    num_movies: int,
    threshold: int,
    max_items_per_user: int | None = None,
):
    """-> (src int32[E], dst int32[E], count f32[E]) with src < dst,
    count >= threshold. user_idx_sorted must be ascending."""
    lib = _lib()
    u = np.ascontiguousarray(user_idx_sorted, dtype=np.int64)
    m = np.ascontiguousarray(movie_idx, dtype=np.int64)
    handle = lib.cooc_count(
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        u.shape[0], num_movies, threshold,
        0 if max_items_per_user is None else int(max_items_per_user),
    )
    if not handle:
        raise MemoryError("cooc_count failed")
    try:
        e = lib.cooc_num_edges(handle)
        src = np.empty(e, np.int32)
        dst = np.empty(e, np.int32)
        w = np.empty(e, np.float32)
        if e:
            lib.cooc_fill(
                handle,
                src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
    finally:
        lib.cooc_free(handle)
    return src, dst, w
