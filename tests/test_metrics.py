"""Metric contract tests (PSNR/SSIM on [0,1], max_val=1.0)."""

import numpy as np
import pytest
import jax.numpy as jnp

from video_to_video_diffusion_tpu.utils.metrics import (
    calculate_psnr,
    calculate_ssim,
    calculate_video_metrics,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_psnr_identical_is_clamped_high(rng):
    # mse clamps to 1e-8 first (reference utils/metrics.py:29-36), so identical
    # inputs give 20*log10(1/1e-4) = 80 dB — the reference's `return 100`
    # branch is unreachable after the clamp and we reproduce that behavior.
    a = rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32)
    np.testing.assert_allclose(calculate_psnr(a, a), 80.0, atol=1e-3)


def test_psnr_known_value():
    a = np.zeros((1, 4, 4, 1), np.float32)
    b = np.full((1, 4, 4, 1), 0.1, np.float32)
    # mse = 0.01 -> psnr = 20*log10(1/0.1) = 20
    np.testing.assert_allclose(calculate_psnr(a, b), 20.0, atol=1e-4)


def test_ssim_identical_close_to_one(rng):
    a = rng.uniform(0, 1, (1, 16, 16, 1)).astype(np.float32)
    assert calculate_ssim(a, a) > 0.99


def test_ssim_noise_reduces(rng):
    a = rng.uniform(0, 1, (1, 16, 16, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    assert calculate_ssim(a, b) < calculate_ssim(a, a)


def test_ssim_5d_equals_per_slice_mean(rng):
    """5D volume SSIM == mean of per-slice SSIM (reference metrics.py:66-80)."""
    v1 = rng.uniform(0, 1, (1, 3, 12, 12, 1)).astype(np.float32)
    v2 = np.clip(v1 + rng.normal(0, 0.1, v1.shape), 0, 1).astype(np.float32)
    whole = calculate_ssim(v1, v2)
    slices = [calculate_ssim(v1[:, d], v2[:, d]) for d in range(3)]
    np.testing.assert_allclose(whole, np.mean(slices), atol=1e-5)


def test_video_metrics_nan_short_circuit(rng):
    v = rng.uniform(0, 1, (1, 2, 8, 8, 1)).astype(np.float32)
    bad = v.copy()
    bad[0, 0, 0, 0, 0] = np.nan
    out = calculate_video_metrics(bad, v)
    assert out == {"psnr": 0.0, "ssim": 0.0, "psnr_per_frame": [], "ssim_per_frame": []}


def test_video_metrics_per_frame(rng):
    v1 = rng.uniform(0, 1, (1, 3, 8, 8, 1)).astype(np.float32)
    v2 = np.clip(v1 + rng.normal(0, 0.05, v1.shape), 0, 1).astype(np.float32)
    out = calculate_video_metrics(v1, v2)
    assert len(out["psnr_per_frame"]) == 3
    assert len(out["ssim_per_frame"]) == 3
    np.testing.assert_allclose(out["psnr"], np.mean(out["psnr_per_frame"]), rtol=1e-6)
    assert 0.0 < out["ssim"] <= 1.0


def test_video_metrics_accepts_4d(rng):
    v1 = rng.uniform(0, 1, (3, 8, 8, 1)).astype(np.float32)
    out = calculate_video_metrics(v1, v1)
    np.testing.assert_allclose(out["psnr"], 80.0, atol=1e-3)
