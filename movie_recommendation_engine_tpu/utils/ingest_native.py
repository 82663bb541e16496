"""ctypes bridge to the native CSV ingest extension (cpp/ingest.cc).

Builds the shared library on first use with g++ (cached next to the package);
falls back silently when no toolchain is available — callers treat any
exception as "use pandas instead" (graph/dataset.py:load_movielens_csv).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "cpp", "ingest.cc")
_SO = os.path.join(os.path.dirname(__file__), "_ingest_native.so")


def _build() -> str:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             src, "-o", _SO],
            check=True, capture_output=True,
        )
    return _SO


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        lib.ingest_count_rows.restype = ctypes.c_longlong
        lib.ingest_count_rows.argtypes = [ctypes.c_char_p]
        lib.ingest_parse_ratings_mt.restype = ctypes.c_longlong
        lib.ingest_parse_ratings_mt.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_longlong,
            ctypes.c_int,
        ]
        _LIB = lib
    return _LIB


def read_ratings_csv(path: str, num_threads: int = 1):
    """-> (user_ids int32[N], movie_ids int32[N], ratings f32[N],
    timestamps int64[N]). ``num_threads`` > 1 splits the file on line
    boundaries and parses ranges in parallel (row order preserved; honors
    cfg.train.num_workers)."""
    lib = _lib()
    cap = lib.ingest_count_rows(path.encode())
    if cap < 0:
        raise FileNotFoundError(path)
    cap = max(cap + 1, 1)
    users = np.empty(cap, np.int32)
    movies = np.empty(cap, np.int32)
    ratings = np.empty(cap, np.float32)
    ts = np.empty(cap, np.int64)
    n = lib.ingest_parse_ratings_mt(
        path.encode(),
        users.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        movies.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ratings.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cap,
        max(int(num_threads), 1),
    )
    if n < 0:
        raise IOError(f"native parse failed for {path}")
    return users[:n], movies[:n], ratings[:n], ts[:n]
