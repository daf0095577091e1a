"""ctypes wrapper for the C++ PLY record reader (native/ply_loader.cpp).

The reference's scene loader is C++ (``src/GSScene.cpp:26-68``); ours keeps a
native fast path for the binary body parse while the header stays in Python.
Falls back to None (caller uses numpy) when the shared library has not been
built. Build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libtpusplat_io.so")
    so = os.path.abspath(so)
    if os.path.exists(so):
        lib = ctypes.CDLL(so)
        lib.tps_read_records.restype = ctypes.c_int64
        lib.tps_read_records.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        _LIB = lib
    return _LIB


def read_records(path, body_offset: int, num_vertices: int, nfloats: int):
    """Read [num_vertices, nfloats] float32 records, or None if unavailable."""
    lib = _load_lib()
    if lib is None:
        return None
    out = np.empty((num_vertices, nfloats), np.float32)
    got = lib.tps_read_records(
        os.fsencode(path),
        body_offset,
        num_vertices,
        nfloats,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if got != num_vertices:
        raise IOError(f"native PLY read failed: got {got} of {num_vertices} records")
    return out
