"""ctypes bindings for the native C++ data loader (native/dataloader.cpp).

Builds on first use (g++, links zlib) and caches the .so next to the source.
``available()`` gates callers; the PIL path in preprocess.py remains the
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libstn_dataloader.so"))
_lib = None
_build_failed = False


def _build() -> bool:
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "dataloader.cpp"))
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _SO_PATH,
             src, "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        _build_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.stn_decode_image.restype = ctypes.c_int
    lib.stn_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.stn_load_batch.restype = ctypes.c_int
    lib.stn_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.stn_decode_npy_pose.restype = ctypes.c_int
    lib.stn_decode_npy_pose.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fp(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_image(
    data: bytes, shape: Tuple[int, int],
    mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
) -> np.ndarray:
    """PNG bytes → normalized CHW float32 [3, H, W]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w = shape
    out = np.empty((3, h, w), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.stn_decode_image(data, len(data), _fp(out), h, w, _fp(mean), _fp(std))
    if rc != 0:
        raise ValueError(f"native PNG decode failed (rc={rc})")
    return out


def load_batch(
    paths: Sequence[str], shape: Tuple[int, int],
    mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5), n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded decode of PNG files → ([N, 3, H, W] float32, status [N])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w = shape
    n = len(paths)
    out = np.empty((n, 3, h, w), np.float32)
    status = np.empty(n, np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.stn_load_batch(c_paths, n, _fp(out), h, w, _fp(mean), _fp(std),
                       n_threads,
                       status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, status


def decode_npy_pose(path: str) -> np.ndarray:
    """Read a 4×4 pose from a .npy file via the native reader."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty(16, np.float32)
    rc = lib.stn_decode_npy_pose(path.encode(), _fp(out))
    if rc != 0:
        raise ValueError(f"native npy read failed (rc={rc})")
    return out.reshape(4, 4)
