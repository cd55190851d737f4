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


def test_discover_cases(tmp_path):
    # npz files and DICOM-series subdirs are cases; everything else is not
    np.savez(str(tmp_path / "b_case.npz"), input=np.zeros((2, 4, 4)))
    np.savez(str(tmp_path / "a_case.npz"), input=np.zeros((2, 4, 4)))
    d = tmp_path / "series1"
    d.mkdir()
    write_minimal_dicom(
        str(d / "s0.dcm"), np.zeros((4, 4), np.float32),
        instance_number=1, z_position=0.0, slice_thickness=1.0,
    )
    (tmp_path / "empty_dir").mkdir()
    (tmp_path / "notes.txt").write_text("junk")
    cases = gv._discover_cases(str(tmp_path))
    assert [stem for stem, _ in cases] == ["a_case", "b_case", "series1"]
    assert all(os.path.exists(p) for _, p in cases)


def test_batch_mode_end_to_end(tmp_path, capsys):
    """Two same-shape npz cases through one process: per-case outputs, one
    compile reused (the second case must not re-trace), per-case JSON lines
    plus the aggregate, a failing case reported without killing the run, and
    a NONZERO exit when any case failed (ADVICE r2)."""
    import json

    import jax

    from video_to_video_diffusion_tpu.config import load_config
    from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
    from video_to_video_diffusion_tpu.utils.checkpoint import save_checkpoint

    cfg = load_config("tiny_test")
    model = VideoToVideoDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32), batch=1)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": params}, metadata={"test": True})

    cases = tmp_path / "cases"
    cases.mkdir()
    rng = np.random.default_rng(0)
    for name in ("p0", "p1"):
        np.savez(
            str(cases / f"{name}.npz"),
            input=rng.uniform(-1, 1, size=(4, 64, 64)).astype(np.float16),
        )
    # a corrupt case must be reported, not fatal
    np.savez(str(cases / "p2_bad.npz"), wrong_key=np.zeros((4, 64, 64)))

    out_dir = str(tmp_path / "out")
    with pytest.raises(SystemExit) as ei:
        gv.main([
            "--config", "tiny_test", "--checkpoint", ckpt,
            "--input-dir", str(cases), "--output-dir", out_dir,
            "--steps", "2", "--patch", "4", "32", "32",
            "--target-patch", "8", "32", "32", "--stride", "2", "16", "16",
            "--vae-batch", "4",
        ])
    assert ei.value.code == 1  # partial failure -> nonzero exit
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    agg = lines[-1]
    assert agg["cases"] == 3 and agg["failed"] == 1
    assert agg["steady_seconds_per_volume"] is not None
    for name in ("p0", "p1"):
        p = os.path.join(out_dir, f"{name}_thin.npz")
        with np.load(p) as z:
            vol = np.asarray(z["volume"], np.float32)
        assert vol.shape == (8, 64, 64)
        assert np.isfinite(vol).all()
    assert not os.path.exists(os.path.join(out_dir, "p2_bad_thin.npz"))


def test_batch_mode_empty_dir_exits(tmp_path):
    with pytest.raises(SystemExit):
        gv.main([
            "--config", "tiny_test", "--checkpoint", "unused",
            "--input-dir", str(tmp_path), "--output-dir", str(tmp_path / "o"),
        ])


def test_load_npz_honors_cache_window(tmp_path):
    p = str(tmp_path / "case.npz")
    np.savez(
        p, input=np.zeros((4, 8, 8), np.float16),
        window_center=np.float32(-600.0), window_width=np.float32(1500.0),
    )
    a = _args(input=p)
    gv._load_input(a)
    assert a.window_center == -600.0 and a.window_width == 1500.0
