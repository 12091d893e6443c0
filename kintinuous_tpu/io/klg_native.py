"""ctypes wrapper for the native .klg decoder (native/klg_reader.cpp).

Builds the shared library on first use (g++ -lz -ljpeg) and falls back
to the pure-Python reader when the toolchain/libs are unavailable. The
native path indexes the log for random access and decodes whole batches
across a thread pool — matched to the tracker's batched TPU dispatch.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libklg_reader.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.klg_open.restype = ctypes.c_void_p
    lib.klg_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.klg_num_frames.restype = ctypes.c_int
    lib.klg_num_frames.argtypes = [ctypes.c_void_p]
    lib.klg_timestamps.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.klg_decode_batch.restype = ctypes.c_int
    lib.klg_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.klg_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeKlgReader:
    """Random-access batched .klg reader backed by the C++ decoder."""

    def __init__(self, path: str, width: int = 640, height: int = 480,
                 threads: int = os.cpu_count() or 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native klg decoder unavailable")
        self._lib = lib
        self.width = width
        self.height = height
        self.threads = threads
        self._h = lib.klg_open(path.encode(), width, height)
        if not self._h:
            raise FileNotFoundError(path)
        self.total_num_frames = lib.klg_num_frames(self._h)

    def timestamps(self) -> np.ndarray:
        out = np.zeros(self.total_num_frames, np.int64)
        self._lib.klg_timestamps(self._h, out.ctypes.data_as(ctypes.c_void_p))
        return out

    def read_batch(self, start: int, count: int):
        """-> (depth (n,H,W) uint16, rgb (n,H,W,3) uint8, ts (n,) int64)."""
        count = max(0, min(count, self.total_num_frames - start))
        if count == 0:
            return (
                np.zeros((0, self.height, self.width), np.uint16),
                np.zeros((0, self.height, self.width, 3), np.uint8),
                np.zeros(0, np.int64),
            )
        depth = np.empty((count, self.height, self.width), np.uint16)
        rgb = np.empty((count, self.height, self.width, 3), np.uint8)
        ts = np.empty(count, np.int64)
        n = self._lib.klg_decode_batch(
            self._h, start, count,
            depth.ctypes.data_as(ctypes.c_void_p),
            rgb.ctypes.data_as(ctypes.c_void_p),
            ts.ctypes.data_as(ctypes.c_void_p),
            self.threads,
        )
        return depth[:n], rgb[:n], ts[:n]

    def close(self):
        if self._h:
            self._lib.klg_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
