"""Config schema tests."""

import dataclasses

import pytest

from video_to_video_diffusion_tpu.config import Config, load_config, preset_path


def test_load_preset_by_name():
    cfg = load_config("tiny_test")
    assert cfg.model.latent_dim == 4
    assert cfg.model.unet_channel_mult == (1, 2)
    assert cfg.data.batch_size == 2


def test_full_medium_preset_matches_reference_hparams():
    cfg = load_config("slice_interpolation_full_medium")
    # reference config/slice_interpolation_full_medium.yaml:7-25
    assert cfg.model.in_channels == 1
    assert cfg.model.latent_dim == 8
    assert cfg.model.vae_base_channels == 128
    assert cfg.model.unet_model_channels == 128
    assert cfg.model.unet_channel_mult == (1, 2, 4, 4)
    assert cfg.model.unet_num_heads == 8
    assert cfg.model.unet_time_embed_dim == 1024
    assert cfg.model.noise_schedule == "cosine"
    assert cfg.model.diffusion_timesteps == 1000
    assert cfg.data.patch_depth_thin == 48
    assert cfg.data.patch_depth_thick == 8
    assert cfg.data.patch_size == (192, 192)
    assert cfg.training.gradient_accumulation_steps == 2
    assert cfg.pretrained.lr_mult_unet == 1.0
    assert cfg.pretrained.lr_mult_vae_encoder == 0.0


def test_vae_preset_latent_16():
    cfg = load_config("vae_training")
    assert cfg.model.latent_dim == 16  # reference config/vae_training.yaml:11
    assert cfg.training.thick_slice_ratio == 0.2


def test_flat_dict_compat():
    """The reference accepts flat model dicts (models/model.py:86)."""
    cfg = load_config({"latent_dim": 5, "unet_model_channels": 32})
    assert cfg.model.latent_dim == 5
    assert cfg.model.unet_model_channels == 32


def test_defaults_and_extra_preserved():
    cfg = load_config({"some_custom_key": 1})
    assert cfg.model.latent_dim == 8  # default
    assert cfg.extra["some_custom_key"] == 1


def test_roundtrip_to_dict():
    cfg = load_config("tiny_test")
    cfg2 = Config.from_dict(cfg.to_dict())
    assert cfg2.model == cfg.model
    assert cfg2.training == cfg.training


def test_config_is_frozen():
    cfg = load_config("tiny_test")
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.model.latent_dim = 3
