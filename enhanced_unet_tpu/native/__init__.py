"""Native C++ host ops with ctypes bindings and transparent numpy fallback.

Accelerates the evaluation pipeline's host-side hot paths: RLE run
extraction (COCO annotations for hundreds of instances per image,
reference train_eval.py:953-992) and pairwise instance-mask IoU (the greedy
matcher's inner product, reference metrics.py:92-107).

The shared library is compiled on first use with g++ (cached next to the
source); when no compiler is available everything falls back to the
vectorized numpy implementations in data.rle / metrics.instance.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostops.cpp")
_LIB = os.path.join(_HERE, "libhostops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                if not _build():
                    return None
            lib = ctypes.CDLL(_LIB)
            lib.rle_encode.restype = ctypes.c_int64
            lib.rle_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.rle_decode.restype = None
            lib.rle_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.pack_masks.restype = None
            lib.pack_masks.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.mask_iou_packed.restype = None
            lib.mask_iou_packed.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def rle_counts_native(mask: np.ndarray) -> Optional[np.ndarray]:
    """Column-major run lengths via C++; None when the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    buf = np.empty(h * w + 1, dtype=np.int64)
    n = lib.rle_encode(
        mask.ctypes.data, h, w, buf.ctypes.data, buf.size
    )
    if n < 0:
        return None
    return buf[:n].copy()


def rle_decode_native(counts: np.ndarray, h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    out = np.empty((h, w), dtype=np.uint8)
    lib.rle_decode(counts.ctypes.data, counts.size, out.ctypes.data, h, w)
    return out


def pairwise_iou_native(
    a: np.ndarray, b: np.ndarray
) -> Optional[np.ndarray]:
    """IoU matrix [n_a, n_b] over stacks of binary HxW masks via packed
    popcount; None when the lib is unavailable."""
    lib = get_lib()
    if lib is None or a.size == 0 or b.size == 0:
        return None
    na, px = a.shape[0], int(np.prod(a.shape[1:]))
    nb = b.shape[0]
    words = (px + 63) // 64
    a8 = np.ascontiguousarray(a.reshape(na, px), dtype=np.uint8)
    b8 = np.ascontiguousarray(b.reshape(nb, px), dtype=np.uint8)
    pa = np.empty(na * words, dtype=np.uint64)
    pb = np.empty(nb * words, dtype=np.uint64)
    lib.pack_masks(a8.ctypes.data, na, px, pa.ctypes.data, words)
    lib.pack_masks(b8.ctypes.data, nb, px, pb.ctypes.data, words)
    out = np.empty(na * nb, dtype=np.float64)
    lib.mask_iou_packed(
        pa.ctypes.data, na, pb.ctypes.data, nb, words, out.ctypes.data
    )
    return out.reshape(na, nb)
