"""ctypes loader for the native augmentation kernel (builds with g++ on
first use; callers fall back to numpy when no toolchain is present)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "augment.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_augment.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.shift_flip_augment.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.u8_to_centered_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                               ctypes.c_int64]
            _LIB = lib
        except Exception:  # noqa: BLE001 - no toolchain: numpy fallback
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def shift_flip_augment(images: np.ndarray, pixels: int, shifts: np.ndarray,
                       horizontal: np.ndarray, flip: np.ndarray) -> np.ndarray:
    """Batched edge-pad shift crop + horizontal flip (uint8 NCHW)."""
    lib = _load()
    assert lib is not None
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, c, h, w = images.shape
    out = np.empty_like(images)
    lib.shift_flip_augment(
        images.ctypes.data, out.ctypes.data, n, c, h, w, pixels,
        np.ascontiguousarray(shifts, np.int32).ctypes.data,
        np.ascontiguousarray(horizontal, np.uint8).ctypes.data,
        np.ascontiguousarray(flip, np.uint8).ctypes.data)
    return out


def u8_to_centered_f32(images: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    images = np.ascontiguousarray(images, dtype=np.uint8)
    out = np.empty(images.shape, np.float32)
    lib.u8_to_centered_f32(images.ctypes.data, out.ctypes.data, images.size)
    return out
