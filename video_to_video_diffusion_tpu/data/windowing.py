"""CT preprocessing: HU windowing and slice resizing (host-side).

Reference: data/slice_interpolation_dataset.py:575-624 — HU values are
clipped to center±width/2, scaled to [0, 1], later shifted to [-1, 1]
(:334-336); slices are bilinearly resized to the 512x512 target.

Each op routes through the native C++ library (native/hostops.cc via
data/_native.py) when it is available: multi-threaded, GIL-free, and
bit-exact vs the numpy implementations kept here (tests/test_native.py
asserts exact equality). Set V2VDT_NATIVE=0 to disable the native path.
Fallback order for resize_slices is native -> cv2 -> numpy: cv2's
INTER_LINEAR agrees with the half-pixel formula only to float precision
(different arithmetic order), so with cv2 installed, toggling the native
path can change cache contents in the last ulp — rebuild caches rather
than mixing the two within one dataset.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from video_to_video_diffusion_tpu.data import _native

try:  # cv2 is the secondary host-side resizer; numpy bilinear is last
    import cv2

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False


def apply_ct_windowing(
    volume_hu: np.ndarray,
    center: float = 40.0,
    width: float = 400.0,
    pm1: bool = False,
) -> np.ndarray:
    """HU -> [0, 1] via window clip (reference :575-592).

    pm1=True fuses the subsequent [-1, 1] shift (to_model_range) into the
    same pass — one HBM-sized traversal instead of two.
    """
    lo = center - width / 2.0
    hi = center + width / 2.0
    nat = _native.window(volume_hu, lo, hi, pm1=pm1)
    if nat is None and _native.lib() is not None:
        nat = _native.window(
            np.ascontiguousarray(volume_hu, dtype=np.float32), lo, hi, pm1=pm1
        )
    if nat is not None:
        return nat
    vol = np.clip(volume_hu.astype(np.float32), lo, hi)
    out = (vol - lo) / (hi - lo)
    return out * 2.0 - 1.0 if pm1 else out


def to_model_range(volume01: np.ndarray) -> np.ndarray:
    """[0, 1] -> [-1, 1] (reference :334-336)."""
    return volume01.astype(np.float32) * 2.0 - 1.0


def from_model_range(volume_pm1: np.ndarray) -> np.ndarray:
    """[-1, 1] -> [0, 1] (metric contract input)."""
    return (volume_pm1.astype(np.float32) + 1.0) / 2.0


def _bilinear_resize_2d(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Half-pixel-center bilinear resize (numpy fallback)."""
    H, W = img.shape
    h, w = size
    ys = (np.arange(h) + 0.5) * H / h - 0.5
    xs = (np.arange(w) + 0.5) * W / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None]
    wx = np.clip(xs - x0, 0, 1)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return (
        a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
    ).astype(img.dtype)


def resize_slices(volume: np.ndarray, size: Tuple[int, int] = (512, 512)) -> np.ndarray:
    """Bilinear per-slice resize of a (D, H, W) volume (reference :594-624)."""
    D, H, W = volume.shape
    if (H, W) == tuple(size):
        return volume
    if volume.dtype == np.float32 and volume.flags.c_contiguous:
        nat = _native.resize_bilinear(volume, (int(size[0]), int(size[1])))
        if nat is not None:
            return nat
    out = np.empty((D, size[0], size[1]), volume.dtype)
    for i in range(D):
        if _HAVE_CV2:
            out[i] = cv2.resize(
                volume[i], (size[1], size[0]), interpolation=cv2.INTER_LINEAR
            )
        else:
            out[i] = _bilinear_resize_2d(volume[i], size)
    return out


def linear_resample_depth(volume: np.ndarray, target_depth: int) -> np.ndarray:
    """Depth-only linear resample with half-pixel centers; returns float32.

    numpy equivalent of torch F.interpolate(mode='trilinear',
    align_corners=False) when only depth changes — used to map a thick
    sub-stack to exactly `patch_depth_thick` slices (reference
    data/patch_slice_interpolation_dataset.py:182-187).
    """
    D = volume.shape[0]
    if D == target_depth:
        return volume.astype(np.float32)
    v32 = np.ascontiguousarray(volume, dtype=np.float32)
    nat = _native.resample_depth(v32, int(target_depth))
    if nat is not None:
        return nat
    zs = (np.arange(target_depth) + 0.5) * D / target_depth - 0.5
    z0 = np.clip(np.floor(zs).astype(int), 0, D - 1)
    z1 = np.clip(z0 + 1, 0, D - 1)
    wz = np.clip(zs - z0, 0, 1).reshape(-1, *([1] * (volume.ndim - 1)))
    return (
        v32[z0].astype(np.float64) * (1 - wz) + v32[z1].astype(np.float64) * wz
    ).astype(np.float32)
