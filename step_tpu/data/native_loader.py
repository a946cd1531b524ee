"""ctypes binding for the native C++ clip loader (native/clip_loader.cc).

Builds the shared library on first use (cmake+ninja, cached under
native/build) and exposes `decode_clip(paths, size)` → normalized float32
[T, size, size, 3]. Falls back to the cv2 path automatically if the build
or libjpeg is unavailable, so the framework never hard-depends on the
native component.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

from step_tpu.data.pipeline import RGB_MEAN, RGB_STD

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libstep_tpu_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    build_dir = os.path.join(_NATIVE_DIR, "build")
    os.makedirs(build_dir, exist_ok=True)
    try:
        subprocess.run(
            ["cmake", "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release", ".."],
            cwd=build_dir, check=True, capture_output=True, timeout=120,
        )
        subprocess.run(
            ["ninja"], cwd=build_dir, check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.stpu_decode_clip.restype = ctypes.c_int
        lib.stpu_decode_clip.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.stpu_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    # STEP_TPU_DISABLE_NATIVE=1 forces the cv2 python decode path: the
    # native libjpeg+bilinear pixels are near- but not bit-identical to
    # cv2's, so decode-parity comparisons (e.g. serve.py vs test.py on the
    # same frames) pin both sides to one decoder.
    if os.environ.get("STEP_TPU_DISABLE_NATIVE"):
        return False
    return get_lib() is not None


def decode_clip(
    paths: Sequence[str],
    size: int,
    mean: np.ndarray = RGB_MEAN,
    std: np.ndarray = RGB_STD,
    n_threads: int = 4,
) -> np.ndarray:
    """Decode+resize+normalize a clip natively → [T, size, size, 3] float32.

    Raises FileNotFoundError on a bad frame; RuntimeError if the native
    library is unavailable (callers should check `native_available()` or
    catch and fall back).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native clip loader unavailable")
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mean_arr = np.ascontiguousarray(mean, np.float32)
    std_arr = np.ascontiguousarray(std, np.float32)
    rc = lib.stpu_decode_clip(
        c_paths,
        n,
        size,
        size,
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if rc != 0:
        raise FileNotFoundError(f"native decode failed for {paths[-rc - 1]}")
    return out
