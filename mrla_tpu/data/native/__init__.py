"""ctypes binding for the native C++ JPEG batch loader (loader.cc).

Builds the shared library on first use (g++ -O3, linked against the system
libjpeg) and caches it next to the source.  Falls back cleanly: callers
should check ``available()`` and use the PIL path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")
_LIB = os.path.join(_DIR, "libmrla_loader.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB, _SRC, "-ljpeg", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.mrla_decode_batch.restype = ctypes.c_int
            lib.mrla_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
            _lib = lib
        except (OSError, subprocess.CalledProcessError) as e:
            _build_error = str(e)
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(
    paths: list[str],
    size: int,
    train: bool,
    seed: int = 0,
    num_threads: int = 8,
) -> np.ndarray:
    """Decode JPEGs -> uint8 [N, size, size, 3]. Raises if lib unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.mrla_decode_batch(
        c_paths,
        n,
        size,
        1 if train else 0,
        ctypes.c_uint64(seed & (2**64 - 1)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    if ok != n:
        # zero-filled slots for unreadable files; surface the count
        import warnings

        warnings.warn(f"native loader decoded {ok}/{n} images")
    return out
