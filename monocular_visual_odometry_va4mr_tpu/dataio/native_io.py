"""ctypes bindings for the native IO library (native/mvo_io.cpp).

The reference decodes each frame synchronously on the consumer thread via
``cv2.imread`` (reference utils.py:77-81); here a C++ worker pool decodes
PNGs ahead of the device loop (SURVEY.md N10 / "hard parts" #6).  Falls back
to cv2 transparently when the library isn't built.

Build: ``make -C native`` (repo root) produces native/libmvo_io.so.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libmvo_io.so",
)
_lib = None


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mvo_decode_png.restype = ctypes.c_int
    lib.mvo_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mvo_open_sequence.restype = ctypes.c_void_p
    lib.mvo_open_sequence.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.mvo_next_frame.restype = ctypes.c_int
    lib.mvo_next_frame.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mvo_close_sequence.restype = None
    lib.mvo_close_sequence.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


_MAX_PIXELS = 4096 * 4096


def decode_png(path: str) -> Optional[np.ndarray]:
    """Decode one PNG to (H, W) f32 grayscale; None if the lib is missing or
    the file unsupported (caller falls back to cv2)."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(_MAX_PIXELS, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.mvo_decode_png(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _MAX_PIXELS, ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return None
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class PrefetchingReader:
    """Ordered iterator over decoded frames with background decode threads."""

    def __init__(self, paths: List[str], num_threads: int = 4,
                 prefetch: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library not available")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.mvo_open_sequence(arr, len(paths), num_threads,
                                             prefetch)
        self._n = len(paths)

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        buf = np.empty(_MAX_PIXELS, np.float32)
        w = ctypes.c_int()
        h = ctypes.c_int()
        for i in range(self._n):
            rc = self._lib.mvo_next_frame(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                _MAX_PIXELS, ctypes.byref(w), ctypes.byref(h),
            )
            if rc != 0:
                raise IOError(f"native decode failed at frame {i}")
            yield i, buf[: w.value * h.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._handle:
            self._lib.mvo_close_sequence(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
