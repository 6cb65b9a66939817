"""ctypes bindings for the native batched JPEG decoder (libghdata.so).

Auto-builds the shared library on first use (``make`` + libjpeg, both in the
toolchain image) and falls back to the PIL path transparently when native
decode is unavailable — loaders call ``decode_batch_center`` /
``decode_batch_random_crop`` and never need to care.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libghdata.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GENHANCER_NATIVE_DECODE", "1") == "0":
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception as e:
                log.info("native decoder build unavailable (%s); using PIL", e)
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ghd_get_dims.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
            lib.ghd_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_ubyte)]
            _lib = lib
        except OSError as e:  # pragma: no cover
            log.info("native decoder load failed (%s); using PIL", e)
        return _lib


def available() -> bool:
    return _load() is not None


def _make_ptrs(blobs: Sequence[bytes]):
    n = len(blobs)
    arr = (ctypes.c_char_p * n)(*blobs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    return arr, lens


def get_dims(blobs: Sequence[bytes]) -> np.ndarray:
    """[n, 2] (w, h); zeros where parsing failed."""
    lib = _load()
    assert lib is not None
    n = len(blobs)
    arr, lens = _make_ptrs(blobs)
    dims = np.zeros(n * 2, np.int32)
    lib.ghd_get_dims(arr, lens, n,
                     dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return dims.reshape(n, 2)


def decode_batch(blobs: Sequence[bytes], rects: np.ndarray, size: int,
                 num_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Decode + crop(rects [n,4] source coords; w<=0 -> full) + resize.

    Returns (images [n, size, size, 3] float32 [0,1], ok [n] bool)."""
    lib = _load()
    assert lib is not None
    n = len(blobs)
    arr, lens = _make_ptrs(blobs)
    rects = np.ascontiguousarray(rects, np.float32)
    out = np.empty((n, size, size, 3), np.float32)
    ok = np.zeros(n, np.uint8)
    lib.ghd_decode_batch(
        arr, lens, n, rects.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, num_threads, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out, ok.astype(bool)


def decode_batch_center(blobs: Sequence[bytes], size: int,
                        num_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Shorter-side resize + center crop (video/eval transform semantics)."""
    dims = get_dims(blobs)
    rects = np.zeros((len(blobs), 4), np.float32)
    for i, (w, h) in enumerate(dims):
        if w == 0 or h == 0:
            rects[i] = (0, 0, -1, -1)
            continue
        side = min(w, h)
        rects[i] = ((w - side) / 2.0, (h - side) / 2.0, side, side)
    return decode_batch(blobs, rects, size, num_threads)


def decode_batch_random_crop(blobs: Sequence[bytes], size: int,
                             rng: np.random.Generator,
                             scale: Tuple[float, float] = (0.9, 1.0),
                             ratio: Tuple[float, float] = (3 / 4, 4 / 3),
                             num_threads: int = 8
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """RandomResizedCrop semantics (dataset_cc3m.py:91-121) with the crop
    geometry computed host-side from parsed headers and the heavy decode in
    native threads."""
    import math
    dims = get_dims(blobs)
    rects = np.zeros((len(blobs), 4), np.float32)
    for i, (w, h) in enumerate(dims):
        if w == 0 or h == 0:
            rects[i] = (0, 0, -1, -1)
            continue
        area = float(w * h)
        found = False
        for _ in range(10):
            target = area * rng.uniform(*scale)
            aspect = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
            cw = int(round(math.sqrt(target * aspect)))
            ch = int(round(math.sqrt(target / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                x0 = int(rng.integers(0, w - cw + 1))
                y0 = int(rng.integers(0, h - ch + 1))
                rects[i] = (x0, y0, cw, ch)
                found = True
                break
        if not found:
            side = min(w, h)
            rects[i] = ((w - side) / 2.0, (h - side) / 2.0, side, side)
    return decode_batch(blobs, rects, size, num_threads)
