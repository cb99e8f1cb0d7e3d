"""Native (C++) runtime components, loaded via ctypes.

``decoder`` — libjpeg/libpng decode + short-side resize + center crop
(decode.cc), compiled on first use with g++ and cached next to the source.
Falls back cleanly when the toolchain or libraries are absent.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "decode.cc")
_SO = os.path.join(os.path.dirname(__file__), "libdecode.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-ljpeg", "-lpng"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logging.info("native decoder build failed (%s); using PIL", e)
        return False


def get_lib():
    """Load (building if needed) the native decoder; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                       os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.decode_resize_crop.restype = ctypes.c_int
            lib.decode_resize_crop.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
        except OSError as e:
            logging.info("native decoder load failed (%s); using PIL", e)
        return _lib


def available() -> bool:
    return get_lib() is not None


def decode_resize_crop(data: bytes, resize: int) -> "np.ndarray | None":
    """bytes -> (resize, resize, 3) uint8, or None on failure (caller falls
    back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((resize, resize, 3), np.uint8)
    rc = lib.decode_resize_crop(
        data, len(data), resize,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None
