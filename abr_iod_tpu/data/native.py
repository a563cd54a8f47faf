"""ctypes bindings for the native host data plane (csrc/abr_host.cpp).

Builds csrc/libabrhost.so on first use when a compiler is available;
every entry point has a pure-numpy fallback so the framework works
without the native library (e.g. on a minimal install).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libabrhost.so")
_lib = None
_tried = False


def _find_lib() -> Optional[str]:
    """Installed-package build first (setup.py compiles csrc/abr_host.cpp
    to abr_iod_tpu/_abrhost*.so), then the repo checkout's csrc/ build."""
    import glob

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hits = sorted(glob.glob(os.path.join(pkg_dir, "_abrhost*.so")))
    if hits:
        return hits[0]
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    try:  # repo checkout with a toolchain: build on first use
        subprocess.run(
            ["make", "-C", _CSRC], check=True, capture_output=True, timeout=120
        )
    except Exception:
        return None
    return _LIB_PATH if os.path.exists(_LIB_PATH) else None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    lib.assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),  # cache
        ctypes.POINTER(ctypes.c_int32),  # sizes
        ctypes.POINTER(ctypes.c_int64),  # indices
        ctypes.POINTER(ctypes.c_uint8),  # flip
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # batch, h, w
        ctypes.POINTER(ctypes.c_float),  # mean
        ctypes.c_int,  # to_bgr
        ctypes.POINTER(ctypes.c_float),  # out
        ctypes.c_int,  # num_threads
    ]
    lib.nms_greedy.restype = ctypes.c_int
    lib.nms_greedy.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.iou_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def assemble_batch(cache: np.ndarray, sizes: np.ndarray, indices: np.ndarray,
                   flip: np.ndarray, mean, to_bgr: bool,
                   num_threads: int = 2) -> np.ndarray:
    """cache [N,H,W,3] u8 (C-contiguous), sizes [N,2] i32, indices [B] i64,
    flip [B] u8 → [B,H,W,3] f32 normalized."""
    lib = _load()
    b = int(indices.shape[0])
    h, w = cache.shape[1], cache.shape[2]
    mean_arr = np.asarray(mean, np.float32)
    if lib is None:
        out = np.empty((b, h, w, 3), np.float32)
        for k, idx in enumerate(indices):
            img = cache[idx].astype(np.float32)
            vh, vw = sizes[idx]
            if flip[k]:
                img[:vh, :vw] = img[:vh, :vw][:, ::-1]
            if to_bgr:
                img = img[..., ::-1]
            out[k] = img - mean_arr
        return out
    out = np.empty((b, h, w, 3), np.float32)
    lib.assemble_batch(
        _ptr(cache, ctypes.c_uint8), _ptr(sizes, ctypes.c_int32),
        _ptr(indices.astype(np.int64), ctypes.c_int64),
        _ptr(flip.astype(np.uint8), ctypes.c_uint8),
        b, h, w, _ptr(mean_arr, ctypes.c_float), int(to_bgr),
        _ptr(out, ctypes.c_float), num_threads,
    )
    return out


def nms_greedy(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float):
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = boxes.shape[0]
    if lib is None:
        from tests.oracles import nms_numpy  # pragma: no cover

        return nms_numpy(boxes, scores, iou_threshold)
    keep = np.empty(n, np.int64)
    kept = lib.nms_greedy(
        _ptr(boxes, ctypes.c_float), _ptr(scores, ctypes.c_float), n,
        float(iou_threshold), _ptr(keep, ctypes.c_int64),
    )
    return keep[:kept]


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    if lib is None:
        area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
        area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
        tl = np.maximum(a[:, None, :2], b[None, :, :2])
        br = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(br - tl + 1, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (area_a[:, None] + area_b[None, :] - inter)
    out = np.empty((a.shape[0], b.shape[0]), np.float32)
    lib.iou_matrix(
        _ptr(a, ctypes.c_float), a.shape[0], _ptr(b, ctypes.c_float), b.shape[0],
        _ptr(out, ctypes.c_float),
    )
    return out
