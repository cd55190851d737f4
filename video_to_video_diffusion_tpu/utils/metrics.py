"""PSNR / SSIM metrics with the reference's [0,1]/max_val=1.0 contract.

Numerical parity with utils/metrics.py in the reference (verified against
torch in tests/test_metrics.py):
  * PSNR: global MSE, clamped to >=1e-8, output clipped to [0, 100]
    (reference :14-44).
  * SSIM: uniform 11x11 window via average pooling with zero padding that
    *includes* the pad in the denominator (torch avg_pool2d default),
    variance clamping, ssim map clipped to [0, 1]; 5D volumes fold depth
    into batch — equivalent to the reference's per-slice recursion :66-80.
  * Video metrics: per-frame PSNR/SSIM averaged, NaN inputs short-circuit to
    zeros (reference :125-193).

Layout: channels-last — (B, H, W, C) images, (B, D, H, W, C) volumes.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def avg_pool2d(
    x: jnp.ndarray, window: int, stride: int = 1, pad: int | None = None
) -> jnp.ndarray:
    """torch F.avg_pool2d semantics (count_include_pad) on (B, H, W, C).

    Default stride=1, pad=window//2 matches the SSIM uniform window; shared
    by the metric SSIM here and the differentiable SSIM/MS-SSIM losses.
    """
    p = window // 2 if pad is None else pad
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )
    return summed / float(window * window)


_avg_pool2d = avg_pool2d  # internal alias


@partial(jax.jit, static_argnames=("max_val",))
def psnr(img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Scalar PSNR in dB, clipped to [0, 100] (reference utils/metrics.py:14-44)."""
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mse = jnp.maximum(jnp.mean((x - y) ** 2), 1e-8)
    val = 20.0 * jnp.log10(max_val / jnp.sqrt(mse))
    return jnp.clip(val, 0.0, 100.0)


@partial(jax.jit, static_argnames=("window_size", "max_val"))
def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    max_val: float = 1.0,
) -> jnp.ndarray:
    """Scalar SSIM in [0, 1] (reference utils/metrics.py:47-122).

    Accepts (B, H, W, C) or (B, D, H, W, C); 5D folds depth into batch.
    """
    if img1.ndim == 5:
        B, D, H, W, C = img1.shape
        img1 = img1.reshape(B * D, H, W, C)
        img2 = img2.reshape(B * D, H, W, C)
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)

    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    eps = 1e-8

    mu1 = _avg_pool2d(x, window_size)
    mu2 = _avg_pool2d(y, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = jnp.maximum(_avg_pool2d(x * x, window_size) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_avg_pool2d(y * y, window_size) - mu2_sq, 0.0)
    sigma12 = _avg_pool2d(x * y, window_size) - mu1_mu2

    num = (2 * mu1_mu2 + C1) * (2 * sigma12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2) + eps
    ssim_map = jnp.clip(num / den, 0.0, 1.0)
    return jnp.nan_to_num(ssim_map).mean()


def calculate_psnr(img1, img2, max_val: float = 1.0) -> float:
    """Python-float PSNR (drop-in for the reference helper)."""
    return float(psnr(jnp.asarray(img1), jnp.asarray(img2), max_val=max_val))


def calculate_ssim(img1, img2, window_size: int = 11, max_val: float = 1.0) -> float:
    """Python-float SSIM (drop-in for the reference helper)."""
    return float(
        ssim(jnp.asarray(img1), jnp.asarray(img2), window_size=window_size, max_val=max_val)
    )


@partial(jax.jit, static_argnames=("max_val",))
def _video_metrics_core(v1: jnp.ndarray, v2: jnp.ndarray, max_val: float = 1.0):
    """Per-frame PSNR/SSIM along the depth axis of (B, D, H, W, C)."""
    B, D, H, W, C = v1.shape
    f1 = jnp.moveaxis(v1, 1, 0).astype(jnp.float32)  # (D, B, H, W, C)
    f2 = jnp.moveaxis(v2, 1, 0).astype(jnp.float32)
    psnr_f = jax.vmap(lambda a, b: psnr(a, b, max_val=max_val))(f1, f2)
    ssim_f = jax.vmap(lambda a, b: ssim(a, b, max_val=max_val))(f1, f2)
    return psnr_f, ssim_f


def calculate_video_metrics(
    video1, video2, max_val: float = 1.0
) -> Dict[str, Union[float, list]]:
    """Frame-averaged PSNR/SSIM dict (reference utils/metrics.py:125-193)."""
    v1 = jnp.asarray(video1)
    v2 = jnp.asarray(video2)
    if v1.ndim == 4:
        v1, v2 = v1[None], v2[None]
    if bool(jnp.isnan(v1).any()) or bool(jnp.isnan(v2).any()):
        return {"psnr": 0.0, "ssim": 0.0, "psnr_per_frame": [], "ssim_per_frame": []}
    psnr_f, ssim_f = _video_metrics_core(v1, v2, max_val=max_val)
    psnr_f = np.asarray(psnr_f)
    ssim_f = np.asarray(ssim_f)
    return {
        "psnr": float(np.nanmean(psnr_f)),
        "ssim": float(np.nanmean(ssim_f)),
        "psnr_per_frame": [float(x) for x in psnr_f],
        "ssim_per_frame": [float(x) for x in ssim_f],
    }
