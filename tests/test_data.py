"""Data pipeline tests: DICOM round-trip, windowing, datasets, loader."""

import os

import numpy as np
import pytest

from video_to_video_diffusion_tpu.config import load_config
from video_to_video_diffusion_tpu.data.datasets import (
    PatchSliceInterpolationDataset,
    SliceInterpolationDataset,
    collate_variable_depth,
    ensure_synthetic_cache,
    patient_split,
)
from video_to_video_diffusion_tpu.data.dicom import (
    load_dicom_volume,
    read_dicom_slice,
    write_minimal_dicom,
)
from video_to_video_diffusion_tpu.data.loader import get_unified_dataloader
from video_to_video_diffusion_tpu.data.synthetic import synthetic_patient_pair, thick_from_thin
from video_to_video_diffusion_tpu.data.windowing import (
    apply_ct_windowing,
    linear_resample_depth,
    resize_slices,
    to_model_range,
)


def _cfg(tmp_path, **data_overrides):
    base = load_config("tiny_test").to_dict()
    base["data"].update(
        processed_dir=str(tmp_path / "cache"),
        synthetic_num_patients=6,
        val_split=0.2,
        test_split=0.2,
        **data_overrides,
    )
    return load_config(base)


def test_windowing_range_and_clip():
    hu = np.array([[-2000.0, -160.0, 40.0, 240.0, 3000.0]], np.float32)
    out = apply_ct_windowing(hu[None], center=40, width=400)[0]
    np.testing.assert_allclose(out[0], [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)
    pm1 = to_model_range(out)
    assert pm1.min() >= -1.0 and pm1.max() <= 1.0


def test_linear_resample_depth_halfpixel():
    import torch
    import torch.nn.functional as F

    v = np.random.default_rng(0).standard_normal((10, 4, 4)).astype(np.float32)
    got = linear_resample_depth(v, 4)
    want = (
        F.interpolate(
            torch.from_numpy(v.copy())[None, None],
            size=(4, 4, 4),
            mode="trilinear",
            align_corners=False,
        )[0, 0]
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_slices_shape():
    v = np.random.default_rng(0).standard_normal((3, 32, 32)).astype(np.float32)
    out = resize_slices(v, (16, 16))
    assert out.shape == (3, 16, 16)


def test_dicom_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    hu = rng.uniform(-1000, 400, (16, 16)).astype(np.float32)
    p = str(tmp_path / "slice1.dcm")
    write_minimal_dicom(p, hu, instance_number=3, z_position=12.5, slice_thickness=5.0)
    s = read_dicom_slice(p)
    np.testing.assert_allclose(s.pixels, np.round(hu + 1024) - 1024, atol=1.0)
    assert s.instance_number == 3
    assert s.z_position == 12.5
    assert s.slice_thickness == 5.0


def test_dicom_volume_sorted_by_z(tmp_path):
    d = tmp_path / "series"
    d.mkdir()
    rng = np.random.default_rng(1)
    # write slices with shuffled filenames but increasing z
    for i, z in enumerate([30.0, 10.0, 20.0]):
        hu = np.full((8, 8), z, np.float32)
        write_minimal_dicom(str(d / f"im_{i}.dcm"), hu, instance_number=i, z_position=z)
    vol, thickness = load_dicom_volume(str(d))
    assert vol.shape == (3, 8, 8)
    assert vol[0, 0, 0] < vol[1, 0, 0] < vol[2, 0, 0]


def test_synthetic_pair_geometry():
    thick, thin = synthetic_patient_pair(0, thin_depth=30, height=32, width=32)
    assert thin.shape == (30, 32, 32)
    assert thick.shape == (6, 32, 32)
    # thick is the block mean of thin
    np.testing.assert_allclose(thick, thick_from_thin(thin, 5), atol=1e-5)


def test_patient_split_deterministic_and_disjoint(tmp_path):
    files = [f"p{i}.npz" for i in range(10)]
    s1 = patient_split(files, 0.2, 0.2, seed=42)
    s2 = patient_split(files, 0.2, 0.2, seed=42)
    assert s1 == s2
    all_files = s1["train"] + s1["val"] + s1["test"]
    assert sorted(all_files) == sorted(files)
    assert len(s1["val"]) == 2 and len(s1["test"]) == 2


def test_full_volume_dataset_and_collate(tmp_path):
    cfg = _cfg(tmp_path, use_patches=False)
    ds = SliceInterpolationDataset(cfg, "train")
    assert len(ds) >= 2
    s = ds[0]
    assert s["input"].ndim == 4 and s["input"].shape[-1] == 1
    assert s["target"].shape[0] > s["input"].shape[0]
    assert s["input"].min() >= -1.0 and s["input"].max() <= 1.0
    batch = collate_variable_depth([ds[0], ds[1]])
    B, D = batch["thin_mask"].shape
    assert batch["target"].shape[:2] == (B, D)
    # padding regions are -1 (air) where mask is 0
    pad = batch["target"][batch["thin_mask"] == 0]
    if pad.size:
        np.testing.assert_allclose(pad, -1.0)


def test_patch_dataset_shapes_and_determinism(tmp_path):
    cfg = _cfg(tmp_path, use_patches=True, patch_depth_thin=8, patch_depth_thick=4,
               patch_size=[32, 32])
    ds = PatchSliceInterpolationDataset(cfg, "train")
    a = ds.__getitem__(0, seed=7)
    b = ds.__getitem__(0, seed=7)
    np.testing.assert_array_equal(a["input"], b["input"])
    assert a["input"].shape == (4, 32, 32, 1)
    assert a["target"].shape == (8, 32, 32, 1)
    c = ds.__getitem__(0, seed=8)
    assert not np.array_equal(a["input"], c["input"])


def test_patch_augment_pairs_stay_aligned(tmp_path):
    """Flips/rot90 must be applied identically to input and target."""
    cfg = _cfg(tmp_path, use_patches=True, patch_depth_thin=8, patch_depth_thick=4,
               patch_size=[32, 32], augment=True)
    ds = PatchSliceInterpolationDataset(cfg, "train")
    rng = np.random.default_rng(3)
    thick = np.zeros((4, 32, 32, 1), np.float32)
    thick[:, :4, :4] = 1.0
    thin = np.repeat(thick, 2, axis=0)
    a_thick, a_thin = ds.augment_patch(thick, thin, rng)
    np.testing.assert_array_equal(np.repeat(a_thick, 2, axis=0), a_thin)


def test_dataloader_batches(tmp_path):
    cfg = _cfg(tmp_path, use_patches=True, patch_depth_thin=8, patch_depth_thick=4,
               patch_size=[32, 32], batch_size=2)
    dl = get_unified_dataloader(cfg, "train")
    batches = list(dl)
    assert len(batches) == len(dl)
    b = batches[0]
    assert b["input"].shape == (2, 4, 32, 32, 1)
    assert b["target"].shape == (2, 8, 32, 32, 1)


def test_dataloader_epoch_reshuffles(tmp_path):
    cfg = _cfg(tmp_path, use_patches=True, patch_depth_thin=8, patch_depth_thick=4,
               patch_size=[32, 32], batch_size=2)
    dl = get_unified_dataloader(cfg, "train")
    e0 = next(iter(dl))["input"]
    e1 = next(iter(dl))["input"]  # epoch advanced inside __iter__
    assert not np.array_equal(e0, e1)


def test_dataloader_rejects_unknown_source(tmp_path):
    base = load_config("tiny_test").to_dict()
    base["data"]["data_source"] = "imagenet"
    with pytest.raises(ValueError):
        get_unified_dataloader(load_config(base), "train")


def test_corrupted_cache_retry_chain(tmp_path):
    """Corrupted .npz falls through to the next sample (reference :626-680)."""
    cfg = _cfg(tmp_path, use_patches=False)
    ds = SliceInterpolationDataset(cfg, "train")
    # corrupt the first file in this split
    with open(ds.files[0], "wb") as f:
        f.write(b"not a zip")
    s = ds[0]
    assert np.isfinite(s["input"]).all()  # served from a neighboring sample


def test_dicom_implicit_vr_roundtrip(tmp_path):
    """Implicit-VR-LE files must parse via the builtin reader."""
    rng = np.random.default_rng(2)
    hu = rng.uniform(-1000, 400, (8, 8)).astype(np.float32)
    p = str(tmp_path / "imp.dcm")
    write_minimal_dicom(p, hu, instance_number=7, z_position=3.5,
                        slice_thickness=5.0, explicit_vr=False)
    s = read_dicom_slice(p)
    np.testing.assert_allclose(s.pixels, np.round(hu + 1024) - 1024, atol=1.0)
    assert s.instance_number == 7 and s.z_position == 3.5


def test_volume_cache_thread_safe(tmp_path):
    """num_workers>0 drives the LRU volume cache from a thread pool; under
    eviction pressure an unlocked cache raced (popitem vs move_to_end) and
    the swallowed KeyError silently substituted the NEXT patient's volume.
    Every threaded draw must be bit-identical to the single-threaded one."""
    from concurrent.futures import ThreadPoolExecutor

    cfg = _cfg(tmp_path, use_patches=False)
    ref = SliceInterpolationDataset(cfg, "train")
    expected = [ref[i]["input"].copy() for i in range(len(ref))]

    # cache sized to hold ~2 volume pairs -> constant eviction churn
    small = _cfg(tmp_path, use_patches=False, cache_size_bytes=2_500_000)
    ds = SliceInterpolationDataset(small, "train")
    idxs = [i % len(ds) for i in range(200)]
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(lambda i: ds[i]["input"], idxs))
    for i, got in zip(idxs, results):
        np.testing.assert_array_equal(got, expected[i])


def test_synthetic_cache_geometry_mismatch_is_hard_error(tmp_path):
    """Round-4 stale-cache trap: a config asking one geometry must never
    silently train on a cache built at another. The cache is self-describing
    (_synthetic_manifest.json); both manifest and legacy (manifest-less)
    caches reject mismatched requests."""
    d = str(tmp_path / "cache")
    ensure_synthetic_cache(d, 2, thin_depth=10, height=24, width=24, seed=7)
    # same geometry: idempotent reuse
    again = ensure_synthetic_cache(d, 2, thin_depth=10, height=24, width=24, seed=7)
    assert len(again) == 2

    with pytest.raises(ValueError, match="geometry|built at"):
        ensure_synthetic_cache(d, 2, thin_depth=10, height=48, width=48, seed=7)
    with pytest.raises(ValueError, match="geometry|built at"):
        ensure_synthetic_cache(d, 2, thin_depth=20, height=24, width=24, seed=7)
    with pytest.raises(ValueError, match="geometry|built at"):
        ensure_synthetic_cache(d, 2, thin_depth=10, height=24, width=24, seed=8)

    # legacy cache (no manifest): first-volume shape still guards geometry
    os.remove(os.path.join(d, "_synthetic_manifest.json"))
    with pytest.raises(ValueError, match="geometry|built at"):
        ensure_synthetic_cache(d, 2, thin_depth=10, height=48, width=48, seed=7)
    # legacy + matching shape: accepted, manifest re-written
    ok = ensure_synthetic_cache(d, 2, thin_depth=10, height=24, width=24, seed=7)
    assert len(ok) == 2
    assert os.path.exists(os.path.join(d, "_synthetic_manifest.json"))

    # the dataset constructor (the path training actually takes) also raises
    base = load_config("tiny_test").to_dict()
    base["data"].update(processed_dir=d, synthetic_num_patients=2,
                        synthetic_thin_depth=10, synthetic_height=48,
                        synthetic_width=48, seed=7)
    cfg = load_config(base)
    with pytest.raises(ValueError, match="geometry|built at"):
        SliceInterpolationDataset(cfg, "train")
