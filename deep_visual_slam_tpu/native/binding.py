"""ctypes binding + lazy build of the native preprocessing library.

pybind11 is not in this image (per environment constraints); the extension
is plain ``extern "C"`` compiled with g++ and loaded via ctypes. The .so is
cached next to the source keyed by a source hash, so rebuilds happen only
when preprocess.cpp changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_HERE, f"_preprocess_{digest}.so")
    if not os.path.exists(so_path):
        # Unique tmp per process: concurrent builders (e.g. xdist workers)
        # must never share a tmp path, or os.replace can publish a file the
        # other process is still writing.
        tmp = f"{so_path}.{os.getpid()}.tmp"
        cmd = [
            "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
            _SRC, "-o", tmp,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        except (subprocess.SubprocessError, OSError) as e:
            print(f"native preprocess build failed ({e}); using cv2 fallback")
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        print(f"native preprocess load failed ({e}); using cv2 fallback")
        return None
    lib.resize_normalize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.jitter_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        with _LOCK:
            if _LIB is None and not _TRIED:
                _LIB = _build_and_load()
                _TRIED = True
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def resize_normalize_batch(
    images_u8: np.ndarray, height: int, width: int, swap_rb: bool = False
) -> Optional[np.ndarray]:
    """[N, sh, sw, 3] uint8 -> [N, height, width, 3] float32 in [0, 1].

    Returns None when the native library is unavailable (caller falls back).
    """
    lib = _get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(images_u8, dtype=np.uint8)
    n, sh, sw, c = src.shape
    assert c == 3
    out = np.empty((n, height, width, 3), np.float32)
    lib.resize_normalize_batch(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, sh, sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height, width, int(swap_rb),
    )
    return out


def jitter_batch(
    images_f32: np.ndarray, brightness: float, contrast: float, saturation: float
) -> Optional[np.ndarray]:
    """In-place brightness/contrast/saturation over [N, H, W, 3] float32."""
    lib = _get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(images_f32, dtype=np.float32)
    n, h, w, c = data.shape
    assert c == 3
    lib.jitter_batch(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, h, w, brightness, contrast, saturation,
    )
    return data
