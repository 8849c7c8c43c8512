"""ctypes bindings for the native episode-assembly core.

Auto-builds ``libepisode_core.so`` on first use (plain g++, no deps) and
falls back to numpy implementations when no compiler is available, so the
framework is pure-Python-runnable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libepisode_core.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(["make", "-s", "-C", _DIR], check=True,
                       capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.assemble_episode.restype = ctypes.c_int
        lib.assemble_episode.argtypes = [
            _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _i64p, _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, _u8p, _u8p, ctypes.c_int,
        ]
        lib.assemble_labels.restype = ctypes.c_int
        lib.assemble_labels.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _i64p, _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, _f32p, _f32p,
        ]
        lib.composite_backgrounds.restype = ctypes.c_int
        lib.composite_backgrounds.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _f32p, ctypes.c_int64,
            _i64p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def assemble_episode(data: np.ndarray, items: np.ndarray, perm: np.ndarray,
                     shot: int, query: int, query_offset: int = 0,
                     n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Gather [T, shot, ...] and [T, query, ...] image stacks.

    data [n_items, views, ...] any dtype; items [T] int64; perm [T, views]
    int64. query_offset=-1 means query views start at perm[0] (eval mode).
    Falls back to numpy fancy indexing when the native lib is unavailable.
    """
    lib = load()
    t = items.shape[0]
    inner = data.shape[2:]
    if lib is None:
        off = (shot + query_offset) if query_offset >= 0 else 0
        ctx = data[items[:, None], perm[:, :shot]]
        qry = data[items[:, None], perm[:, off:off + query]]
        return np.ascontiguousarray(ctx), np.ascontiguousarray(qry)

    row_bytes = int(np.prod(inner)) * data.dtype.itemsize
    ctx = np.empty((t, shot) + inner, data.dtype)
    qry = np.empty((t, query) + inner, data.dtype)
    rc = lib.assemble_episode(
        data.view(np.uint8).reshape(-1),
        data.shape[0], data.shape[1], row_bytes,
        np.ascontiguousarray(items, np.int64),
        np.ascontiguousarray(perm, np.int64),
        t, shot, query, query_offset,
        ctx.view(np.uint8).reshape(-1), qry.view(np.uint8).reshape(-1),
        n_threads)
    if rc != 0:
        raise ValueError(f"assemble_episode failed with code {rc}")
    return ctx, qry


def composite_backgrounds(images: np.ndarray, bg: np.ndarray,
                          bg_idx: np.ndarray, n_threads: int = 0):
    """In-place alpha compositing for a [N, H, W, 4] float32 split."""
    lib = load()
    if lib is None:
        mask = (images[..., 3] < 1.0)[..., None]
        images[..., :3] = (images[..., :3] * mask
                           + bg[bg_idx % bg.shape[0]] * (1 - mask))
        return
    n, h, w, _ = images.shape
    rc = lib.composite_backgrounds(
        images.reshape(-1), n, h * w, bg.reshape(-1), bg.shape[0],
        np.ascontiguousarray(bg_idx, np.int64), n_threads)
    if rc != 0:
        raise ValueError(f"composite_backgrounds failed with code {rc}")
