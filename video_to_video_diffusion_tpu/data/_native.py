"""ctypes bindings for the native host-ops library (native/hostops.cc).

The reference's input pipeline runs its hot preprocessing (HU windowing,
per-slice resize, depth resample — data/slice_interpolation_dataset.py:575-624,
data/patch_slice_interpolation_dataset.py:182-187) inside torch/cv2 native
kernels under DataLoader workers. Our numpy pipeline gets the same treatment
here: a small C++ library, compiled on demand with g++ and loaded via
ctypes (no pybind11 in this image). ctypes releases the GIL for the call,
and the kernels thread internally, so a many-core TPU-VM host overlaps
preprocessing with the Python producer loop.

Everything degrades gracefully: if g++ or the .so is unavailable (or
V2VDT_NATIVE=0), `lib()` returns None and callers keep the numpy path.
The kernels are bit-exact vs their numpy references (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "hostops.cc"
_SO = _REPO_ROOT / "native" / "build" / "libhostops.so"
_ABI_VERSION = 1

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    """Compile via `make -C native` (the Makefile owns the flags; ~1 s)."""
    if not _SRC.exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_SRC.parent), "-B"],
            check=True, capture_output=True, timeout=120,
        )
        return _SO.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    if os.environ.get("V2VDT_NATIVE", "1").lower() in ("0", "off", "false"):
        return None
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        # Stale/foreign-arch .so: rebuild once.
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
    try:
        lib.hostops_abi_version.restype = ctypes.c_int
        if lib.hostops_abi_version() != _ABI_VERSION:
            # Source moved past the built .so: rebuild.
            if not _build():
                return None
            lib = ctypes.CDLL(str(_SO))
            if lib.hostops_abi_version() != _ABI_VERSION:
                return None
    except AttributeError:
        return None

    i64, f32, c_int = ctypes.c_int64, ctypes.c_float, ctypes.c_int
    ptr = ctypes.c_void_p
    lib.hostops_window_f32.argtypes = [ptr, ptr, i64, f32, f32, c_int]
    lib.hostops_window_i16.argtypes = [ptr, ptr, i64, f32, f32, c_int]
    lib.hostops_window_f16.argtypes = [ptr, ptr, i64, f32, f32, c_int]
    lib.hostops_resize_bilinear_f32.argtypes = [ptr, ptr, i64, i64, i64, i64, i64]
    lib.hostops_resample_depth_f32.argtypes = [ptr, ptr, i64, i64, i64]
    for name in (
        "hostops_window_f32", "hostops_window_i16", "hostops_window_f16",
        "hostops_resize_bilinear_f32", "hostops_resample_depth_f32",
    ):
        getattr(lib, name).restype = None
    return lib


def lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None if unavailable/disabled (memoized)."""
    global _lib, _tried
    if not _tried:
        _lib = _load()
        _tried = True
    return _lib


def _ptr(a: np.ndarray) -> ctypes.c_void_p:
    return ctypes.c_void_p(a.ctypes.data)


_WINDOW_FNS = {
    np.dtype(np.float32): "hostops_window_f32",
    np.dtype(np.int16): "hostops_window_i16",
    np.dtype(np.float16): "hostops_window_f16",
}


def window(
    volume: np.ndarray, lo: float, hi: float, pm1: bool = False
) -> Optional[np.ndarray]:
    """Fused clip+scale to [0,1] (or [-1,1]); None if the lib can't take it."""
    L = lib()
    if L is None:
        return None
    fn = _WINDOW_FNS.get(volume.dtype)
    if fn is None or not volume.flags.c_contiguous:
        return None
    out = np.empty(volume.shape, np.float32)
    getattr(L, fn)(
        _ptr(volume), _ptr(out), volume.size,
        ctypes.c_float(lo), ctypes.c_float(hi), 1 if pm1 else 0,
    )
    return out


def resize_bilinear(
    volume: np.ndarray, size: Tuple[int, int]
) -> Optional[np.ndarray]:
    """(D, H, W) f32 -> (D, h, w) f32 half-pixel bilinear; None if unusable."""
    L = lib()
    if L is None:
        return None
    if volume.dtype != np.float32 or not volume.flags.c_contiguous:
        return None
    if volume.ndim != 3:
        return None
    D, H, W = volume.shape
    h, w = int(size[0]), int(size[1])
    out = np.empty((D, h, w), np.float32)
    L.hostops_resize_bilinear_f32(_ptr(volume), _ptr(out), D, H, W, h, w)
    return out


def resample_depth(volume: np.ndarray, target_depth: int) -> Optional[np.ndarray]:
    """Depth-only linear resample of (D, ...) f32; None if unusable."""
    L = lib()
    if L is None:
        return None
    if volume.dtype != np.float32 or not volume.flags.c_contiguous:
        return None
    if volume.ndim < 1 or volume.shape[0] < 1:
        return None
    D = volume.shape[0]
    R = int(np.prod(volume.shape[1:], dtype=np.int64)) if volume.ndim > 1 else 1
    out = np.empty((target_depth,) + volume.shape[1:], np.float32)
    L.hostops_resample_depth_f32(_ptr(volume), _ptr(out), D, R, int(target_depth))
    return out
