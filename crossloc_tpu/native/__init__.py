"""Native host-IO runtime: C++ image decode + resize behind a ctypes C ABI.

The TPU-native equivalent of the reference's multiprocess DataLoader workers
(`utils/learning.py:250-252`): libjpeg/libpng decode in C++ releases the GIL
per call, so a Python thread pool achieves truly parallel decode without
process forks. Falls back to PIL transparently when the library isn't built.

Build once with `bash crossloc_tpu/native/build.sh` (or call
`ensure_built()`), producing `libclloader.so` next to this file.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libclloader.so")
_lib: Optional[ctypes.CDLL] = None


def ensure_built(quiet: bool = True) -> bool:
    """Compile the library if missing; returns availability."""
    if os.path.exists(_SO):
        return True
    try:
        subprocess.run(
            ["bash", os.path.join(_DIR, "build.sh")],
            check=True,
            capture_output=quiet,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not ensure_built():
        return None
    lib = ctypes.CDLL(_SO)
    lib.cl_image_dims.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cl_image_dims.restype = ctypes.c_int
    lib.cl_load_image.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.cl_load_image.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def image_dims(path: str):
    """(h, w) of the stored image, or None on decode failure."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.cl_image_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def load_image(path: str, target_h: int, target_w: int) -> Optional[np.ndarray]:
    """Decode + bilinear-resize to [target_h, target_w, 3] float32 in [0,1].
    Returns None if the native path is unavailable or decoding fails."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((target_h, target_w, 3), dtype=np.float32)
    rc = lib.cl_load_image(
        path.encode(), target_h, target_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def load_image_std_height(path: str, image_height: int) -> Optional[np.ndarray]:
    """Decode + resize to the standard height, preserving aspect ratio
    (the dataset-layer contract, `dataloader/dataloader.py:174`)."""
    dims = image_dims(path)
    if dims is None:
        return None
    h, w = dims
    tw = int(round(w * image_height / h))
    return load_image(path, image_height, tw)
