"""generate_volume CLI: input loading modes and HU round-trip contract.

The full CLI (checkpoint -> stitched generation -> npz/DICOM out) is driven
end-to-end by the verify recipe; these tests cover the host-side plumbing
cheaply: synthetic/npz/DICOM input normalization to (1, D, H, W, 1) [-1, 1],
and the window inversion used for DICOM output.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pytest

import scripts.generate_volume as gv
from video_to_video_diffusion_tpu.data.dicom import (
    load_dicom_volume,
    write_minimal_dicom,
)
from video_to_video_diffusion_tpu.data.windowing import apply_ct_windowing


def _args(**kw) -> argparse.Namespace:
    base = dict(
        input=None, synthetic=None, input_key="input",
        synthetic_depth=4, synthetic_size=32,
        window_center=40.0, window_width=400.0, ratio=2,
        dicom_out=None,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def test_load_synthetic():
    vol, thickness = gv._load_input(_args(synthetic=3))
    assert vol.shape == (1, 4, 32, 32, 1) and vol.dtype == np.float32
    assert thickness == 2.0
    assert -1.0 <= vol.min() and vol.max() <= 1.0


def test_load_npz_3d_and_key_error(tmp_path):
    p = str(tmp_path / "case.npz")
    np.savez(p, input=np.zeros((4, 8, 8), np.float16))
    vol, _ = gv._load_input(_args(input=p))
    assert vol.shape == (1, 4, 8, 8, 1) and vol.dtype == np.float32
    with pytest.raises(SystemExit):
        gv._load_input(_args(input=p, input_key="missing"))


def test_load_dicom_dir_windows_to_pm1(tmp_path):
    d = str(tmp_path / "series")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    hu = rng.uniform(-200, 300, size=(3, 16, 16)).astype(np.float32)
    for i in range(3):
        write_minimal_dicom(
            os.path.join(d, f"s{i}.dcm"), hu[i], instance_number=i + 1,
            z_position=float(i), slice_thickness=2.0,
        )
    vol, thickness = gv._load_input(_args(input=d))
    assert vol.shape == (1, 3, 16, 16, 1)
    assert thickness == 2.0
    back, _ = load_dicom_volume(d)
    want = apply_ct_windowing(back.astype(np.float32), 40.0, 400.0, pm1=True)
    np.testing.assert_allclose(vol[0, ..., 0], want, atol=1e-6)


def test_window_inversion_roundtrip():
    # The CLI's DICOM output inverts the window: pm1 -> HU within the window.
    hu = np.linspace(-160.0, 240.0, 9, dtype=np.float32)
    pm1 = apply_ct_windowing(hu, 40.0, 400.0, pm1=True)
    lo = 40.0 - 400.0 / 2.0
    hu_back = (pm1 + 1.0) / 2.0 * 400.0 + lo
    np.testing.assert_allclose(hu_back, hu, atol=1e-3)


def test_load_npz_honors_cache_window(tmp_path):
    p = str(tmp_path / "case.npz")
    np.savez(
        p, input=np.zeros((4, 8, 8), np.float16),
        window_center=np.float32(-600.0), window_width=np.float32(1500.0),
    )
    a = _args(input=p)
    gv._load_input(a)
    assert a.window_center == -600.0 and a.window_width == 1500.0
