"""ctypes binding for the native batch-gather library.

`lib()` compiles gather.cpp on first use (g++, ~1 s) and memoizes the handle;
callers fall back to the numpy path when compilation is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libgather.so"
_lib = None
_tried = False


def lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < (_DIR / "gather.cpp").stat().st_mtime:
            subprocess.run(["make", "-C", str(_DIR), "-s"], check=True, capture_output=True)
        _lib = ctypes.CDLL(str(_SO))
        i64p = ctypes.POINTER(ctypes.c_int64)
        _lib.gather_windows_u8.argtypes = [
            ctypes.c_void_p, i64p, i64p, ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]
        _lib.gather_windows_f32.argtypes = _lib.gather_windows_u8.argtypes
        _lib.gather_rows_f32.argtypes = [
            ctypes.c_void_p, i64p, i64p, ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]
    except Exception:
        _lib = None
    return _lib


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather_windows_u8(base, offsets, lens, row_elems, demo_idx, t_idx, stack, out, threads=None):
    threads = threads or min(8, os.cpu_count() or 1)
    lib().gather_windows_u8(
        base.ctypes.data_as(ctypes.c_void_p), _p64(offsets), _p64(lens),
        row_elems, _p64(demo_idx), _p64(t_idx), len(demo_idx), stack,
        out.ctypes.data_as(ctypes.c_void_p), threads,
    )


def gather_windows_f32(base, offsets, lens, row_elems, demo_idx, t_idx, stack, out, threads=None):
    threads = threads or min(8, os.cpu_count() or 1)
    lib().gather_windows_f32(
        base.ctypes.data_as(ctypes.c_void_p), _p64(offsets), _p64(lens),
        row_elems, _p64(demo_idx), _p64(t_idx), len(demo_idx), stack,
        out.ctypes.data_as(ctypes.c_void_p), threads,
    )


def gather_rows_f32(base, offsets, lens, row_elems, demo_idx, t_idx, out, threads=None):
    threads = threads or min(8, os.cpu_count() or 1)
    lib().gather_rows_f32(
        base.ctypes.data_as(ctypes.c_void_p), _p64(offsets), _p64(lens),
        row_elems, _p64(demo_idx), _p64(t_idx), len(demo_idx),
        out.ctypes.data_as(ctypes.c_void_p), threads,
    )
