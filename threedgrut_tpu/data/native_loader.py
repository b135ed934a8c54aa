"""ctypes bindings for the native C++ data-loading runtime (libdataio.so).

Provides threaded JPEG/PNG decode + box downsampling + async prefetch -
the TPU-native replacement for the reference's torch DataLoader worker
processes (threedgrut/datasets/utils.py:163). Falls back to PIL when the
shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libdataio.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src_dir = os.path.dirname(_LIB_PATH)
        if os.path.exists(os.path.join(src_dir, "Makefile")):
            try:
                subprocess.run(["make", "-C", src_dir], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dataio_create.restype = ctypes.c_void_p
    lib.dataio_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.dataio_destroy.argtypes = [ctypes.c_void_p]
    lib.dataio_prefetch.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.c_int]
    lib.dataio_get_dims.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
    lib.dataio_get_dims.restype = ctypes.c_int
    lib.dataio_copy.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_uint8),
                                ctypes.c_int64]
    lib.dataio_copy.restype = ctypes.c_int
    lib.dataio_decode.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.dataio_decode.restype = ctypes.c_int
    lib.dataio_decode_bytes.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                        ctypes.c_int64, ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_uint8),
                                        ctypes.c_int64,
                                        ctypes.POINTER(ctypes.c_int),
                                        ctypes.POINTER(ctypes.c_int),
                                        ctypes.POINTER(ctypes.c_int)]
    lib.dataio_decode_bytes.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def decode_image(path: str, downsample: int = 1) -> Optional[np.ndarray]:
    """One-shot native decode -> uint8 HWC array (None on failure)."""
    lib = _load_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.dataio_decode(path.encode(), downsample, None, 0,
                           ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    if rc != 0:
        return None
    out = np.empty((h.value, w.value, c.value), np.uint8)
    rc = lib.dataio_decode(
        path.encode(), downsample,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    return out if rc == 0 else None


def decode_image_bytes(data: bytes, downsample: int = 1
                       ) -> Optional[np.ndarray]:
    """Native decode of in-memory JPEG/PNG bytes -> uint8 HWC array.

    The NCore loader's fast JPEG path (reference datasetNcore.py:703-721
    uses simplejpeg/libjpeg-turbo on the SDK's encoded frame bytes; this
    is the equivalent in-process libjpeg route). Returns None when the
    native lib is unavailable or the decode fails (callers fall back to
    PIL).
    """
    lib = _load_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.dataio_decode_bytes(src, buf.size, downsample, None, 0,
                                 ctypes.byref(w), ctypes.byref(h),
                                 ctypes.byref(c))
    if rc != 0:
        return None
    out = np.empty((h.value, w.value, c.value), np.uint8)
    rc = lib.dataio_decode_bytes(
        src, buf.size, downsample,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(c))
    return out if rc == 0 else None


class NativePrefetchLoader:
    """Async threaded image loader over a fixed path list."""

    def __init__(self, paths: Sequence[str], downsample: int = 1,
                 n_threads: int = 8):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libdataio.so unavailable; run make -C native")
        self._lib = lib
        self.paths = list(paths)
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._handle = lib.dataio_create(arr, len(self.paths), downsample,
                                         n_threads)

    def prefetch(self, indices: Sequence[int]):
        arr = (ctypes.c_int * len(indices))(*indices)
        self._lib.dataio_prefetch(self._handle, arr, len(indices))

    def get(self, index: int) -> np.ndarray:
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        rc = self._lib.dataio_get_dims(self._handle, index, ctypes.byref(w),
                                       ctypes.byref(h), ctypes.byref(c))
        if rc != 0:
            raise IOError(f"decode failed for {self.paths[index]}")
        out = np.empty((h.value, w.value, c.value), np.uint8)
        rc = self._lib.dataio_copy(
            self._handle, index,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size)
        if rc != 0:
            raise IOError(f"copy failed for {self.paths[index]}")
        return out

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.dataio_destroy(self._handle)
            self._handle = None
