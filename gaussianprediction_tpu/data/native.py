"""ctypes bindings for the native data-path library (csrc/fastpng.cpp).

Provides `decode_png` / `decode_png_batch` backed by the multi-threaded C++
PNG decoder, with graceful degradation: if the shared library isn't built
(csrc/build.sh) or a file uses an unsupported PNG variant, callers fall
back to PIL (data/image_io.py wires this in). The library is also built
on-demand the first time it's requested, when a toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc", "libfastpng.so",
)
_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            script = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
            try:
                subprocess.run(
                    ["sh", script], capture_output=True, timeout=120,
                    check=True,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.fastpng_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.fastpng_probe.restype = ctypes.c_int
        lib.fastpng_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.fastpng_decode.restype = ctypes.c_int
        lib.fastpng_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.fastpng_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_png(path: str, channels: Optional[int] = None
               ) -> Optional[np.ndarray]:
    """Decode one PNG to float32 [H, W, C] in [0,1]; None on unsupported."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.fastpng_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(c)) != 0:
        return None
    out_c = channels if channels is not None else c.value
    buf = np.empty((h.value, w.value, out_c), np.float32)
    rc = lib.fastpng_decode(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w.value, h.value, out_c,
    )
    return buf if rc == 0 else None


def decode_png_batch(paths: List[str], channels: int = 3,
                     n_threads: int = 8) -> Optional[List[np.ndarray]]:
    """Decode many PNGs in parallel on C++ threads (GIL released)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    ws = (ctypes.c_int * n)()
    hs = (ctypes.c_int * n)()
    cs = (ctypes.c_int * n)()
    bufs: List[np.ndarray] = []
    cpaths = (ctypes.c_char_p * n)()
    outs = (ctypes.POINTER(ctypes.c_float) * n)()
    for i, p in enumerate(paths):
        w = ctypes.c_int(); h = ctypes.c_int(); c = ctypes.c_int()
        if lib.fastpng_probe(p.encode(), ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(c)) != 0:
            return None
        ws[i], hs[i], cs[i] = w.value, h.value, channels
        buf = np.empty((h.value, w.value, channels), np.float32)
        bufs.append(buf)
        cpaths[i] = p.encode()
        outs[i] = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ok = lib.fastpng_decode_batch(cpaths, n, outs, ws, hs, cs, n_threads)
    return bufs if ok == n else None
