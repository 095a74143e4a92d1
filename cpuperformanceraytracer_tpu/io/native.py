"""ctypes bindings for the native IO library (native/librgbe.so).

Loads lazily; every entry point falls back to the pure-Python
implementation when the library is absent, so the native build is an
optimization, never a requirement. Build with `make -C native`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "librgbe.so"),
        os.path.join(os.path.dirname(__file__), "librgbe.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if not path:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.rgbe_read_header.restype = ctypes.c_int
        lib.rgbe_read_header.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.rgbe_decode.restype = ctypes.c_int
        lib.rgbe_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.bmp_encode.restype = ctypes.c_long
        lib.bmp_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def read_hdr_native(path: str, flip_vertical: bool = True):
    """Native .hdr decode; returns (H, W, 3) f32 or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        raw = f.read()
    w = ctypes.c_int()
    h = ctypes.c_int()
    off = ctypes.c_long()
    if lib.rgbe_read_header(raw, len(raw), ctypes.byref(w),
                            ctypes.byref(h), ctypes.byref(off)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.float32)
    rc = lib.rgbe_decode(
        raw, len(raw), off.value, w.value, h.value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        return None
    if flip_vertical:
        out = np.ascontiguousarray(out[::-1])
    return out


def write_bmp_native(path: str, rgb: np.ndarray) -> bool:
    """Native BMP encode+write; returns False if unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    cap = 54 + ((w * 3 + 3) & ~3) * h
    out = np.empty(cap, np.uint8)
    n = lib.bmp_encode(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if n <= 0:
        return False
    with open(path, "wb") as f:
        f.write(out[:n].tobytes())
    return True
