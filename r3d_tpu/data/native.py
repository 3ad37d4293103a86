"""ctypes bindings for the native host loader (native/fastloader.cpp).

Builds lazily with g++ the first time it's requested; every entry point
falls back to the NumPy path when the toolchain or .so is unavailable, so
the native component is an accelerator, never a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "fastloader.cpp")
_SO = os.path.join(_REPO, "native", "libfastloader.so")

_lib = None
_build_failed = False


def build(force: bool = False) -> Optional[str]:
    """Compile the shared library. Returns the .so path or None."""
    global _build_failed
    if os.path.exists(_SO) and not force:
        return _SO
    if not os.path.exists(_SRC):
        return None
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.npy_probe.restype = ctypes.c_int64
    lib.npy_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.load_sliced.restype = ctypes.c_int64
    lib.load_sliced.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.load_batch.restype = ctypes.c_int64
    lib.load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def probe(path: str) -> Optional[Tuple[Tuple[int, ...], int]]:
    """(shape, word_size) of a .npy file, header-only."""
    lib = get_lib()
    if lib is None:
        return None
    shape = (ctypes.c_int64 * 8)()
    ws = ctypes.c_int64()
    nd = lib.npy_probe(path.encode(), shape, 8, ctypes.byref(ws))
    if nd < 0:
        return None
    return tuple(int(shape[i]) for i in range(nd)), int(ws.value)


def load_sliced(
    path: str, observed_len: int, stride: int, out_rows: int, row_elems: int,
    transpose: bool = False,
) -> Optional[Tuple[np.ndarray, int]]:
    """Read + slice + subsample + zero-pad one video into [out_rows, row_elems].

    Returns (array, rows_loaded) or None on any failure (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((out_rows, row_elems), np.float32)
    n = lib.load_sliced(
        path.encode(), observed_len, stride,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_rows, row_elems, int(transpose),
    )
    if n < 0:
        return None
    return out, int(n)


def load_batch(
    paths: Sequence[str],
    observed_lens: Sequence[int],
    stride: int,
    out_rows: int,
    row_elems: int,
    transpose: bool = False,
) -> Optional[Tuple[np.ndarray, List[int]]]:
    """Threaded batch assembly -> [B, out_rows, row_elems] float32."""
    lib = get_lib()
    if lib is None:
        return None
    B = len(paths)
    out = np.empty((B, out_rows, row_elems), np.float32)
    c_paths = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    c_lens = (ctypes.c_int64 * B)(*observed_lens)
    c_rows = (ctypes.c_int64 * B)()
    failed = lib.load_batch(
        c_paths, c_lens, stride, B,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_rows, row_elems, int(transpose), c_rows,
    )
    if failed != 0:
        return None
    return out, [int(c_rows[i]) for i in range(B)]


if __name__ == "__main__":  # pragma: no cover
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build(force=True) or "build failed")
