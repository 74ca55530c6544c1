"""ctypes binding for the native C++ Canny (native/canny.cpp).

Host-side fast path replacing the reference's OpenCV C++ binding
(src/pipeline.py:205).  Auto-builds with ``make -C native`` on first use if
g++ is available; falls back to the numpy reference otherwise.  The JAX
version (ops/canny.py) remains the on-device path inside jitted programs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastedit_native.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fastedit_canny.restype = ctypes.c_int
        lib.fastedit_canny.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def canny_native(
    image: np.ndarray, low_threshold: float = 100.0, high_threshold: float = 200.0
) -> np.ndarray:
    """uint8 [H, W, 3] or [H, W] -> uint8 [H, W] edges in {0, 255}.

    Falls back to the numpy reference when the shared library is missing.
    """
    lib = _load()
    img = np.ascontiguousarray(image, dtype=np.uint8)
    if lib is None:
        from fastedit_tpu.ops.canny import canny_np

        return canny_np(img.astype(np.float32), low_threshold, high_threshold)
    h, w = img.shape[:2]
    channels = 1 if img.ndim == 2 else img.shape[2]
    out = np.empty((h, w), dtype=np.uint8)
    rc = lib.fastedit_canny(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        channels,
        float(low_threshold),
        float(high_threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"fastedit_canny failed with code {rc}")
    return out
