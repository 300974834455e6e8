"""ctypes bindings for the native (C++) video decode pipeline.

The reference's host decode is Python cv2 inside DataLoader worker
processes (reference: tools/datasets/video_dataset.py:62-94,
tools/train/train_t2v_enterance.py:125-132). Our host pipeline decodes
in threads (data/datasets.py); this module moves the whole per-video
decode — open, fps-stride sampling, BGR->RGB, packing — into one C++
call (native/video_decode.cc) that releases the GIL for its entire
duration, so N decode threads give N-way parallel decode.

The library is built on demand (``make -C native``) and everything
falls back to the Python cv2 path when a toolchain or OpenCV dev
headers are absent — behavior is identical either way (the C++ decode
mirrors read_video_frames' sampling exactly; tests/test_native_decode.py
asserts bit-equality).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO = os.path.join(_ROOT, "native", "build", "libvgen_decode.so")

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("VGEN_NATIVE_DECODE", "1") == "0":
            _load_failed = True
            return None
        try:
            if not os.path.exists(_SO):
                subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                               check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.vd_decode.restype = ctypes.POINTER(ctypes.c_ubyte)
            lib.vd_decode.argtypes = [ctypes.c_char_p, ctypes.c_double,
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
            lib.vd_free.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
            lib.vd_pool_new.restype = ctypes.c_void_p
            lib.vd_pool_new.argtypes = [ctypes.c_int]
            lib.vd_pool_free.argtypes = [ctypes.c_void_p]
            lib.vd_submit.restype = ctypes.c_long
            lib.vd_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_double, ctypes.c_int]
            lib.vd_fetch.restype = ctypes.POINTER(ctypes.c_ubyte)
            lib.vd_fetch.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
            _lib = lib
        except Exception as e:  # noqa: BLE001
            logger.info("native decode unavailable (%s) — using cv2 path", e)
            _load_failed = True
    return _lib


def available() -> bool:
    return _try_load() is not None


def _to_array(lib, ptr, f, h, w) -> np.ndarray:
    try:
        buf = np.ctypeslib.as_array(ptr, shape=(f.value, h.value,
                                                w.value, 3))
        return buf.copy()
    finally:
        lib.vd_free(ptr)


def read_video_frames_native(path: str, max_frames: int = -1,
                             sample_fps: Optional[float] = None
                             ) -> Optional[np.ndarray]:
    """Decode to [f,h,w,3] uint8 RGB via the C++ library; None when the
    library is unavailable (caller falls back to cv2). Raises IOError on
    a decode failure, matching read_video_frames."""
    lib = _try_load()
    if lib is None:
        return None
    f = ctypes.c_int()
    h = ctypes.c_int()
    w = ctypes.c_int()
    ptr = lib.vd_decode(path.encode(), float(sample_fps or 0.0),
                        int(max_frames), ctypes.byref(f), ctypes.byref(h),
                        ctypes.byref(w))
    if not ptr:
        raise IOError(f"native decode failed for {path}")
    return _to_array(lib, ptr, f, h, w)


class DecodePool:
    """Native thread-pool decoder: submit() returns a ticket, fetch()
    blocks for the [f,h,w,3] uint8 array. All decode work happens in C++
    threads — zero GIL contention with the training loop."""

    def __init__(self, num_threads: int = 4):
        lib = _try_load()
        if lib is None:
            raise RuntimeError("native decode library unavailable")
        self._lib = lib
        self._pool = lib.vd_pool_new(int(num_threads))

    def submit(self, path: str, max_frames: int = -1,
               sample_fps: Optional[float] = None) -> int:
        if self._pool is None:
            raise ValueError("DecodePool is closed")
        return self._lib.vd_submit(self._pool, path.encode(),
                                   float(sample_fps or 0.0), int(max_frames))

    def fetch(self, ticket: int) -> np.ndarray:
        if self._pool is None:
            raise ValueError("DecodePool is closed")
        f = ctypes.c_int()
        h = ctypes.c_int()
        w = ctypes.c_int()
        ptr = self._lib.vd_fetch(self._pool, int(ticket), ctypes.byref(f),
                                 ctypes.byref(h), ctypes.byref(w))
        if not ptr:
            raise IOError("native decode failed")
        return _to_array(self._lib, ptr, f, h, w)

    def close(self):
        if self._pool:
            self._lib.vd_pool_free(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass
