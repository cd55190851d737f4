"""End-to-end integration: DICOM -> preprocess -> patches -> train step.

BASELINE config #5: "end-to-end pipeline: DICOM -> HU-window -> patch
dataset + diffusion train step (frozen VAE)". Builds a synthetic DICOM case
(thick '1' and thin '2' series) with the built-in writer, runs the real
preprocessing, and trains one frozen-VAE diffusion step on the result.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.config import load_config
from video_to_video_diffusion_tpu.data.datasets import (
    PatchSliceInterpolationDataset,
    preprocess_case,
)
from video_to_video_diffusion_tpu.data.dicom import write_minimal_dicom
from video_to_video_diffusion_tpu.data.synthetic import synthetic_patient_pair
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
from video_to_video_diffusion_tpu.training.state import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _write_dicom_case(case_dir, seed=0):
    thick_hu, thin_hu = synthetic_patient_pair(seed, thin_depth=20, height=32, width=32)
    for series, vol, thickness in (("1", thick_hu, 5.0), ("2", thin_hu, 1.0)):
        d = os.path.join(case_dir, "study", series)
        os.makedirs(d)
        for i in range(vol.shape[0]):
            write_minimal_dicom(
                os.path.join(d, f"im_{i:03d}.dcm"),
                vol[i],
                instance_number=i + 1,
                z_position=i * thickness,
                slice_thickness=thickness,
            )


def test_dicom_to_train_step(tmp_path):
    # 1. synthetic DICOM archive -> preprocessing cache
    cache = tmp_path / "cache"
    cache.mkdir()
    for pid in range(3):
        case = tmp_path / f"case{pid}"
        case.mkdir()
        _write_dicom_case(str(case), seed=pid)
        preprocess_case(
            str(case), str(cache / f"APE__{pid}.npz"),
            window_center=40, window_width=400, target_size=(32, 32),
        )
    files = sorted(os.listdir(cache))
    assert len(files) == 3

    # 2. patch dataset over the cache
    base = load_config("tiny_test").to_dict()
    base["data"].update(
        processed_dir=str(cache), synthetic_num_patients=0,
        patch_depth_thin=8, patch_depth_thick=4, patch_size=[32, 32],
        val_split=0.0, test_split=0.0, batch_size=2,
    )
    cfg = load_config(base)
    ds = PatchSliceInterpolationDataset(cfg, "train")
    s = ds.__getitem__(0, seed=0)
    assert s["input"].shape == (4, 32, 32, 1)
    assert s["target"].shape == (8, 32, 32, 1)
    assert s["input"].min() >= -1.0 and s["input"].max() <= 1.0
    # thick series content must be block-mean-like of thin (same windowing)
    assert abs(s["input"].mean() - s["target"].mean()) < 0.3

    # 3. one frozen-VAE diffusion train step
    model = VideoToVideoDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32))
    tx, _ = make_optimizer(
        cfg, params, total_steps=10,
        lr_multipliers={"vae_encoder": 0.0, "vae_decoder": 0.0, "unet": 1.0},
    )
    state = create_train_state(params, tx)
    batch = {
        "input": jnp.asarray(np.stack([ds.__getitem__(i, seed=i)["input"] for i in range(2)])),
        "target": jnp.asarray(np.stack([ds.__getitem__(i, seed=i)["target"] for i in range(2)])),
    }
    step = jax.jit(
        make_train_step(lambda p, b, k: model.loss_fn(p, b["input"], b["target"], k), tx)
    )
    vae_before = jax.tree_util.tree_leaves(state.params["vae"])[0].copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    vae_after = jax.tree_util.tree_leaves(state.params["vae"])[0]
    np.testing.assert_array_equal(np.asarray(vae_before), np.asarray(vae_after))  # frozen
