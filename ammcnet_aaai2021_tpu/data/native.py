"""ctypes bindings for the native C++ loader (ammc_loader.cpp).

Builds the shared library on demand with g++ (no pip deps; links the
system libjpeg) and falls back to the cv2/NumPy path when a toolchain isn't
available.  API mirrors the Python loaders in
:mod:`ammcnet_aaai2021_tpu.data.datasets` so callers can swap freely:

    decode_video(paths, size)    -> (T, h, w, 3) uint8 RGB
    load_flow_video(paths, size, reproduce_bug) -> (T, h, w, 2) float32
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native",
                    "ammc_loader.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native",
                         "libammc_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           os.path.abspath(_SRC), "-o", os.path.abspath(_LIB_PATH),
           "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
        lib_fresh = (os.path.exists(_LIB_PATH)
                     and os.path.getmtime(_LIB_PATH) >= src_mtime)
        if not lib_fresh and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None
        lib.ammc_version.restype = ctypes.c_int
        lib.ammc_decode_video.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
        lib.ammc_decode_video.restype = ctypes.c_int
        lib.ammc_load_flow_video.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
        lib.ammc_load_flow_video.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_video(paths: Sequence[str], size: Tuple[int, int],
                 n_threads: int = 8) -> np.ndarray:
    """JPEG files -> (T, h, w, 3) uint8 RGB, threaded native decode."""
    lib = get_lib()
    h, w = size
    if lib is None:
        from .datasets import _decode_rgb

        return np.stack([_decode_rgb(p, size) for p in paths])
    out = np.empty((len(paths), h, w, 3), np.uint8)
    rc = lib.ammc_decode_video(_paths_array(paths), len(paths), h, w,
                               n_threads, out)
    if rc != 0:
        raise RuntimeError(f"native decode_video failed with code {rc}")
    return out


def load_flow_video(paths: Sequence[str], size: Tuple[int, int],
                    reproduce_bug: bool = True,
                    n_threads: int = 8) -> np.ndarray:
    """.flo files -> (T, h, w, 2) float32, normalized, threaded native."""
    lib = get_lib()
    h, w = size
    if lib is None:
        from .datasets import load_flow

        return np.stack([load_flow(p, size, reproduce_bug) for p in paths])
    out = np.empty((len(paths), h, w, 2), np.float32)
    rc = lib.ammc_load_flow_video(_paths_array(paths), len(paths), h, w,
                                  int(reproduce_bug), n_threads, out)
    if rc != 0:
        raise RuntimeError(f"native load_flow_video failed with code {rc}")
    return out
