"""ctypes bindings for the native track reader (native/track_reader.cpp).

Builds the shared library on demand with the in-tree Makefile (g++ only; no
pybind11 in this environment) and exposes ``parse_csv_columns``.  Falls back
cleanly: callers check ``available()`` and use pandas otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtrack_reader.so")
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "track_reader.cpp")
        if not os.path.exists(src):
            _build_failed = True
            return None
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tr_parse_csv.restype = ctypes.c_void_p
    lib.tr_parse_csv.argtypes = [ctypes.c_char_p, ctypes.c_char,
                                 ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int]
    lib.tr_rows.restype = ctypes.c_int64
    lib.tr_rows.argtypes = [ctypes.c_void_p]
    lib.tr_data.restype = ctypes.POINTER(ctypes.c_double)
    lib.tr_data.argtypes = [ctypes.c_void_p]
    lib.tr_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_header(path: str, sep: str = ",") -> List[str]:
    with open(path, "r") as fh:
        return [c.strip() for c in fh.readline().rstrip("\n\r").split(sep)]


def parse_csv_columns(path: str, columns: Sequence[str], sep: str = ",",
                      n_threads: int = 0) -> Optional[np.ndarray]:
    """Parse the named numeric columns of a CSV into an (N, n_cols) float64
    array (non-numeric cells become NaN).  Returns None if the native
    library is unavailable or a column is missing."""
    lib = _load()
    if lib is None:
        return None
    header = read_header(path, sep)
    try:
        idx = [header.index(c) for c in columns]
    except ValueError:
        return None
    arr_idx = (ctypes.c_int * len(idx))(*idx)
    handle = lib.tr_parse_csv(path.encode(), sep.encode(), arr_idx,
                              len(idx), 1, n_threads)
    if not handle:
        return None
    try:
        rows = lib.tr_rows(handle)
        if rows < 0:
            return None
        buf = np.ctypeslib.as_array(lib.tr_data(handle),
                                    shape=(rows, len(idx)))
        return np.array(buf, dtype=np.float64)   # copy before free
    finally:
        lib.tr_free(handle)
