"""Native host-ops (native/hostops.cc) vs numpy reference: exact parity.

The C++ kernels promise bit-for-bit agreement with the numpy
implementations in data/windowing.py (double interpolation weights, double
accumulate, final round-to-nearest float32 store). These tests hold them to
it, and check the graceful-fallback contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from video_to_video_diffusion_tpu.data import _native
from video_to_video_diffusion_tpu.data.windowing import (
    _bilinear_resize_2d,
    apply_ct_windowing,
    linear_resample_depth,
    resize_slices,
    to_model_range,
)

pytestmark = pytest.mark.skipif(
    _native.lib() is None, reason="native hostops unavailable (no g++?)"
)


def _np_window(vol, center=40.0, width=400.0, pm1=False):
    lo, hi = center - width / 2.0, center + width / 2.0
    out = (np.clip(vol.astype(np.float32), lo, hi) - lo) / (hi - lo)
    return out.astype(np.float32) * 2.0 - 1.0 if pm1 else out


@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.float16])
def test_window_exact(dtype):
    rng = np.random.default_rng(0)
    hu = rng.uniform(-1200, 1400, size=(5, 33, 41))
    vol = hu.astype(dtype)
    for pm1 in (False, True):
        got = _native.window(vol, 40.0 - 200.0, 40.0 + 200.0, pm1=pm1)
        assert got is not None and got.dtype == np.float32
        np.testing.assert_array_equal(got, _np_window(vol, pm1=pm1))


def test_window_f16_specials():
    # Subnormal halves, zero, and extremes must convert correctly.
    vals = np.array(
        [0.0, -0.0, 6e-8, -6e-8, 65504.0, -65504.0, 1.5, -240.0], np.float16
    )
    got = _native.window(vals, -160.0, 240.0, pm1=False)
    np.testing.assert_array_equal(got, _np_window(vals))


def test_apply_ct_windowing_routes_and_matches():
    rng = np.random.default_rng(1)
    hu = rng.uniform(-1000, 1000, size=(4, 17, 19)).astype(np.float32)
    np.testing.assert_array_equal(apply_ct_windowing(hu), _np_window(hu))
    np.testing.assert_array_equal(
        apply_ct_windowing(hu, pm1=True),
        to_model_range(_np_window(hu)),
    )
    # Non-contiguous input still computes correctly (copy-then-native).
    nc = hu[:, ::2, :]
    assert not nc.flags.c_contiguous
    np.testing.assert_array_equal(apply_ct_windowing(nc), _np_window(nc))


def test_resize_bilinear_exact_vs_numpy():
    rng = np.random.default_rng(2)
    vol = rng.standard_normal((3, 37, 29)).astype(np.float32)
    got = _native.resize_bilinear(vol, (16, 24))
    assert got is not None and got.shape == (3, 16, 24)
    want = np.stack([_bilinear_resize_2d(s, (16, 24)) for s in vol])
    np.testing.assert_array_equal(got, want)


def test_resize_bilinear_upscale_and_identity_grid():
    rng = np.random.default_rng(3)
    vol = rng.standard_normal((2, 8, 8)).astype(np.float32)
    got = _native.resize_bilinear(vol, (17, 31))
    want = np.stack([_bilinear_resize_2d(s, (17, 31)) for s in vol])
    np.testing.assert_array_equal(got, want)
    # Same-size resize through the raw native op is the identity.
    same = _native.resize_bilinear(vol, (8, 8))
    np.testing.assert_array_equal(same, vol)


def test_resize_slices_routing_shape_dtype():
    vol = np.random.default_rng(4).standard_normal((2, 32, 32)).astype(np.float32)
    out = resize_slices(vol, (16, 16))
    assert out.shape == (2, 16, 16) and out.dtype == np.float32


def test_resample_depth_exact():
    rng = np.random.default_rng(5)
    vol = rng.standard_normal((11, 7, 5)).astype(np.float32)
    for td in (4, 11, 23):
        got = linear_resample_depth(vol, td)
        assert got.dtype == np.float32 and got.shape == (td, 7, 5)
        if td == 11:
            np.testing.assert_array_equal(got, vol)
            continue
        zs = (np.arange(td) + 0.5) * 11 / td - 0.5
        z0 = np.clip(np.floor(zs).astype(int), 0, 10)
        z1 = np.clip(z0 + 1, 0, 10)
        wz = np.clip(zs - z0, 0, 1).reshape(-1, 1, 1)
        want = (
            vol[z0].astype(np.float64) * (1 - wz) + vol[z1].astype(np.float64) * wz
        ).astype(np.float32)
        np.testing.assert_array_equal(got, want)


def test_native_disabled_fallback(monkeypatch):
    # With the lib force-disabled the numpy paths produce identical results.
    rng = np.random.default_rng(6)
    hu = rng.uniform(-500, 500, size=(3, 21, 21)).astype(np.float32)
    native_out = apply_ct_windowing(hu)
    monkeypatch.setattr(_native, "_lib", None)
    monkeypatch.setattr(_native, "_tried", True)
    assert _native.window(hu, -160.0, 240.0) is None
    np.testing.assert_array_equal(apply_ct_windowing(hu), native_out)
