"""Residual-mode (pixel-residual parametrization) tests.

The quality-critical property: with the zero-initialized decoder tail, an
UNTRAINED residual-mode pipeline reproduces the trilinear interpolation
baseline exactly, so trained models can only improve on it. Plus shape/parity
checks for the conditioning fold and the staged pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from video_to_video_diffusion_tpu.inference.pipeline import (
    generate_volume,
    staged_generate,
)
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
from video_to_video_diffusion_tpu.ops.resize import resize_trilinear, space_to_depth

CFG = {
    "model": {
        "in_channels": 1,
        "latent_dim": 6,
        "vae_base_channels": 8,
        "vae_num_down_stages": 2,
        "unet_model_channels": 8,
        "unet_num_res_blocks": 1,
        "unet_attention_levels": [1],
        "unet_channel_mult": [1, 2],
        "unet_num_heads": 2,
        "unet_time_embed_dim": 16,
        "noise_schedule": "cosine",
        "diffusion_timesteps": 50,
        "prediction_type": "v",
        "residual_mode": True,
        "residual_gain": 4.0,
    },
    "training": {"mixed_precision": False},
    "hardware": {"device": "cpu", "gradient_checkpointing": False},
}


@pytest.fixture(scope="module")
def model_and_params():
    m = VideoToVideoDiffusion(CFG)
    params = m.init(jax.random.PRNGKey(0), patch_shape=(4, 16, 16), batch=1)
    return m, params


def test_space_to_depth_lossless():
    x = jnp.arange(1 * 2 * 8 * 8 * 3, dtype=jnp.float32).reshape(1, 2, 8, 8, 3)
    y = space_to_depth(x, 4)
    assert y.shape == (1, 2, 2, 2, 48)
    # fold is a pure rearrangement: every input value appears exactly once
    assert np.array_equal(np.sort(np.asarray(y).ravel()), np.asarray(x).ravel())
    # block (0,0) of the spatial grid maps to the first output vector
    block = np.asarray(x)[0, 0, :4, :4, :].reshape(4, 4, 3)
    assert np.array_equal(np.asarray(y)[0, 0, 0, 0], block.ravel())


def test_untrained_generate_equals_trilinear(model_and_params):
    m, params = model_and_params
    key = jax.random.PRNGKey(3)
    v_in = jax.random.uniform(key, (1, 4, 16, 16, 1), minval=-1, maxval=1)
    out = m.generate(params, v_in, key, sampler="ddim", num_inference_steps=4,
                     target_depth=12)
    tri = jnp.clip(resize_trilinear(v_in, (12, 16, 16)), -1, 1)
    # zero-init decoder tail -> decode == tanh(0) == 0 -> out == trilinear
    assert float(jnp.abs(out - tri).max()) == 0.0


def test_staged_generate_matches_model_generate(model_and_params):
    m, params = model_and_params
    key = jax.random.PRNGKey(4)
    v_in = jax.random.uniform(key, (2, 4, 16, 16, 1), minval=-1, maxval=1)
    a = m.generate(params, v_in, key, sampler="ddim", num_inference_steps=4,
                   target_depth=12)
    b = staged_generate(m, params, v_in, key, num_inference_steps=4,
                        target_depth=12)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_loss_finite_with_unet_gradient(model_and_params):
    m, params = model_and_params
    v_in = jax.random.uniform(jax.random.PRNGKey(0), (1, 4, 16, 16, 1),
                              minval=-1, maxval=1)
    v_gt = jax.random.uniform(jax.random.PRNGKey(1), (1, 12, 16, 16, 1),
                              minval=-1, maxval=1)
    loss, metrics = m.loss_fn(params, v_in, v_gt, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: m.loss_fn(p, v_in, v_gt, jax.random.PRNGKey(2))[0])(
        params
    )
    assert float(optax.global_norm(grads["unet"])) > 0.0


def test_full_volume_stitch_near_trilinear_at_init(model_and_params):
    m, params = model_and_params
    vol = jnp.clip(jax.random.normal(jax.random.PRNGKey(5), (1, 8, 32, 32, 1)), -1, 1)
    out = generate_volume(
        m, params, vol, jax.random.PRNGKey(6), num_inference_steps=2,
        patch_size=(4, 16, 16), target_patch_size=(12, 16, 16),
        stride=(2, 8, 8), vae_batch=2,
    )
    tri = jnp.clip(resize_trilinear(vol, (24, 32, 32)), -1, 1)
    assert out.shape == (1, 24, 32, 32, 1)
    # patch-wise trilinear differs from global trilinear only at patch edges,
    # which the Gaussian blend downweights; the stitched init output must
    # stay a faithful trilinear interpolation
    assert float(jnp.abs(out - tri).max()) < 0.05


def test_residual_vae_trainer_end_to_end_metric():
    from video_to_video_diffusion_tpu.training.train_vae import VAETrainer

    cfg = {
        "model": {"in_channels": 1, "latent_dim": 4, "vae_base_channels": 8,
                  "vae_num_down_stages": 2, "residual_mode": True,
                  "residual_gain": 4.0},
        "data": {"patch_depth_thick": 4, "patch_size": [16, 16]},
        "training": {"num_epochs": 1, "learning_rate": 1e-3,
                     "mixed_precision": False,
                     "checkpoint_dir": "/tmp/vres_test_ck",
                     "log_dir": "/tmp/vres_test_log",
                     "experiment_name": "t"},
        "hardware": {"device": "cpu", "gradient_checkpointing": False},
    }
    tr = VAETrainer(cfg)
    rng = np.random.default_rng(0)

    def batch():
        thin = rng.uniform(-1, 1, (1, 12, 16, 16, 1)).astype(np.float32)
        thick = thin[:, ::3]
        return {"input": thick, "target": thin}

    loader = [batch() for _ in range(2)]
    tr.setup_optimizer(len(loader))
    tr.train_epoch(loader)
    val = tr.validate(loader)
    # end-to-end score + the trilinear baseline logged next to it; the
    # residual autoencoder sees the true residual, so even one step keeps
    # (or beats) the baseline
    assert "val_psnr_trilinear" in val
    assert val["val_psnr"] >= val["val_psnr_trilinear"] - 0.1


def test_output_tanh_off_preserves_floor_and_unbounds_decoder():
    """model.vae_output_tanh: false (ADVICE r3) — the zero-init floor must
    survive (a zero conv emits 0 with or without tanh) and the decoder must
    be able to represent residuals beyond +/-1."""
    cfg = {k: dict(v) for k, v in CFG.items()}
    cfg["model"]["vae_output_tanh"] = False
    m = VideoToVideoDiffusion(cfg)
    key = jax.random.PRNGKey(7)
    params = m.init(key, patch_shape=(4, 16, 16), batch=1)
    v_in = jax.random.uniform(key, (1, 4, 16, 16, 1), minval=-1, maxval=1)
    out = m.generate(params, v_in, key, sampler="ddim", num_inference_steps=4,
                     target_depth=12)
    tri = jnp.clip(resize_trilinear(v_in, (12, 16, 16)), -1, 1)
    assert float(jnp.abs(out - tri).max()) == 0.0

    # un-zero the output conv bias: without tanh the decoder emits values
    # beyond the +/-1 bound; with tanh the same params are capped below 1
    big = jax.tree_util.tree_map(lambda x: x, params)
    big["vae"]["decoder"]["conv_out"]["bias"] = (
        jnp.ones_like(big["vae"]["decoder"]["conv_out"]["bias"]) * 3.0
    )
    z = jnp.zeros((1, 12, 4, 4, cfg["model"]["latent_dim"]), jnp.float32)
    dec_free = m.decode(big, z)
    assert float(dec_free.max()) > 1.5

    m_tanh = VideoToVideoDiffusion(CFG)
    dec_capped = m_tanh.decode(big, z)
    assert float(jnp.abs(dec_capped).max()) <= 1.0
    np.testing.assert_allclose(
        np.asarray(dec_capped), np.tanh(np.asarray(dec_free)), atol=1e-5
    )
