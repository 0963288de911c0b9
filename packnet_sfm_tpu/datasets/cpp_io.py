"""
ctypes bindings for the native PNG decode/resize library (csrc/pngio.cpp).

The library is built lazily with `make -C csrc` on first import if the .so
is missing; all entry points return None on failure so callers (datasets/io.py)
fall back to PIL.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    so = os.path.join(here, 'libpngio.so')
    if not os.path.exists(so):
        csrc = os.path.join(here, '..', '..', 'csrc')
        try:
            subprocess.run(['make', '-C', csrc], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.png_info.argtypes = [ctypes.c_char_p] + \
            [ctypes.POINTER(ctypes.c_int)] * 4
        lib.png_decode8.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.c_int]
        lib.png_decode16.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_uint16),
                                     ctypes.c_int]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def decode_png(path):
    """Decode 8-bit PNG -> uint8 [H,W,C] array or None."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    if lib.png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                    ctypes.byref(c), ctypes.byref(bd)) != 0:
        return None
    if bd.value != 8:
        return None
    out = np.empty((h.value, w.value, c.value), np.uint8)
    rc = lib.png_decode8(path.encode(),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         out.size)
    if rc <= 0:
        return None
    return out.squeeze() if c.value == 1 else out


def decode_png16(path):
    """Decode 16-bit gray PNG -> uint16 [H,W] array or None."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    if lib.png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                    ctypes.byref(c), ctypes.byref(bd)) != 0:
        return None
    if bd.value != 16 or c.value != 1:
        return None
    out = np.empty((h.value, w.value), np.uint16)
    rc = lib.png_decode16(path.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                          out.size)
    if rc <= 0:
        return None
    return out
