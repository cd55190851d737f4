"""Every parsed config knob must be consulted (VERDICT r1: dead-knob audit).

Covers: losses.* -> training loss (gradients actually change), pretrained
freeze_epochs, data.num_workers, data.extract_dir, hardware.mesh_*_axis,
training.use_lpips, and the lazy validation-batch cache.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.config import load_config
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion


def _tiny(**sections):
    base = load_config("tiny_test").to_dict()
    for sec, d in sections.items():
        base[sec].update(d)
    return load_config(base)


def _loss_grads(model, params, step):
    v_in = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 32, 32, 1)) * 2 - 1
    v_gt = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 32, 32, 1)) * 2 - 1

    def f(p):
        return model.loss_fn(p, v_in, v_gt, jax.random.PRNGKey(3), step=step)[0]

    return jax.jit(jax.grad(f))(params)


class TestLossesSection:
    def test_lambda_ssim_changes_gradients(self):
        """losses.use_ms_ssim_loss shapes the UNet update (VERDICT item 3)."""
        base_model = VideoToVideoDiffusion("tiny_test")
        params = base_model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32))
        ssim_model = VideoToVideoDiffusion(
            _tiny(losses={"use_ms_ssim_loss": True, "lambda_ssim": 0.3,
                          "ssim_every_n_steps": 2})
        )
        g_base = _loss_grads(base_model, params, jnp.int32(0))
        g_ssim = _loss_grads(ssim_model, params, jnp.int32(0))  # gated ON
        diff = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.abs(b[0] - b[1]).sum()),
            jax.tree_util.tree_map(lambda a, b: (a, b), g_base["unet"], g_ssim["unet"]),
            0.0,
        )
        assert diff > 0.0, "MS-SSIM term produced identical UNet gradients"
        # VAE stays gradient-free: encodes and the aux decode are stop_gradient'd
        vae_norm = sum(
            float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g_ssim["vae"])
        )
        assert vae_norm == 0.0

    def test_every_n_gating_off_step_matches_base(self):
        base_model = VideoToVideoDiffusion("tiny_test")
        params = base_model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32))
        ssim_model = VideoToVideoDiffusion(
            _tiny(losses={"use_ms_ssim_loss": True, "lambda_ssim": 0.3,
                          "ssim_every_n_steps": 2})
        )
        v_in = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 32, 32, 1)) * 2 - 1
        v_gt = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 32, 32, 1)) * 2 - 1
        l_base, _ = base_model.loss_fn(params, v_in, v_gt, jax.random.PRNGKey(3))
        l_off, m_off = ssim_model.loss_fn(
            params, v_in, v_gt, jax.random.PRNGKey(3), step=jnp.int32(1)
        )
        np.testing.assert_allclose(float(l_off), float(l_base), rtol=1e-6)
        assert float(m_off["ms_ssim_loss"]) == 0.0
        # gated step: convex combination (1-l)*mse + l*ssim, reference
        # diffusion.py:233-236
        l_on, m_on = ssim_model.loss_fn(
            params, v_in, v_gt, jax.random.PRNGKey(3), step=jnp.int32(0)
        )
        expect = 0.7 * float(l_base) + 0.3 * float(m_on["ms_ssim_loss"])
        np.testing.assert_allclose(float(l_on), expect, rtol=1e-5)

    def test_perceptual_requires_weights_path(self):
        with pytest.raises(ValueError, match="perceptual_weights_path"):
            VideoToVideoDiffusion(
                _tiny(losses={"use_perceptual_loss": True, "lambda_perceptual": 0.1})
            )

    def test_diffusion_loss_cannot_be_disabled(self):
        with pytest.raises(ValueError):
            VideoToVideoDiffusion(_tiny(losses={"use_diffusion_loss": False}))


def test_pretrained_roundtrip_flat_and_nested():
    """to_dict() (flat field names) -> from_dict must preserve pretrained.*"""
    cfg = load_config(
        {"pretrained": {"use_pretrained": True,
                        "vae": {"enabled": True, "checkpoint_path": "/x",
                                "freeze_epochs": 3},
                        "layer_lr_multipliers": {"vae_encoder": 0.5, "unet": 0.9}}}
    )
    rt = load_config(cfg.to_dict())
    assert rt.pretrained == cfg.pretrained
    assert rt.pretrained.vae_checkpoint_path == "/x"
    assert rt.pretrained.freeze_epochs == 3
    assert rt.pretrained.lr_mult_vae_encoder == 0.5
    assert rt.pretrained.lr_mult_unet == 0.9


class TestTrainerKnobs:
    def _trainer(self, tmp_path, **over):
        from video_to_video_diffusion_tpu.data.loader import get_unified_dataloader
        from video_to_video_diffusion_tpu.training.trainer import Trainer

        sections = {
            "data": {
                "processed_dir": str(tmp_path / "cache"),
                "synthetic_num_patients": 8,
                "val_split": 0.25,
                "test_split": 0.25,
                "patch_depth_thin": 8,
                "patch_depth_thick": 4,
                "patch_size": [32, 32],
                "batch_size": 1,
            },
            "training": {
                "checkpoint_dir": str(tmp_path / "ckpts"),
                "log_dir": str(tmp_path / "logs"),
                "num_epochs": 2,
                "patch_val_interval": 0,
                "full_val_interval": 0,
                "final_val_enabled": False,
                "log_interval": 0,
            },
        }
        for sec, d in over.items():
            sections.setdefault(sec, {}).update(d)
        cfg = _tiny(**sections)
        model = VideoToVideoDiffusion(cfg)
        return Trainer(
            model, cfg,
            get_unified_dataloader(cfg, "train"),
            get_unified_dataloader(cfg, "val"),
        )

    def test_freeze_epochs_unfreezes(self, tmp_path):
        """pretrained.freeze_epochs drives the VAE unfreeze transition
        (reference trainer.py:728-732 simple freeze mode)."""
        tr = self._trainer(
            tmp_path,
            pretrained={"vae": {"freeze_epochs": 1}, "two_phase_training": False},
        )
        assert tr.current_phase == 1
        tr.train()
        assert tr.current_phase == 2

    def test_tier2_generation_uses_staged_pipeline(self, tmp_path):
        """validate_patches(generate=True) goes through staged_generate (the
        monolithic model.generate jit stalls remote TPU compiles)."""
        tr = self._trainer(tmp_path)
        out = tr.validate_patches(num_samples=1, generate=True)
        assert np.isfinite(out["patch_psnr"])
        assert 0.0 <= out["patch_ssim"] <= 1.0

    def test_val_cache_fills_lazily(self, tmp_path):
        tr = self._trainer(tmp_path)
        assert tr._val_cache is None
        tr.validate_loss_only(max_batches=1)
        assert len(tr._val_cache) == 1
        tr.validate_loss_only(max_batches=2)
        assert len(tr._val_cache) == 2


class TestDataKnobs:
    def test_num_workers_deterministic(self, tmp_path):
        from video_to_video_diffusion_tpu.data.datasets import (
            PatchSliceInterpolationDataset,
        )
        from video_to_video_diffusion_tpu.data.loader import DataLoader

        cfg = _tiny(
            data={
                "processed_dir": str(tmp_path / "cache"),
                "synthetic_num_patients": 6,
                "patch_depth_thin": 8,
                "patch_depth_thick": 4,
                "patch_size": [16, 16],
            }
        )
        ds = PatchSliceInterpolationDataset(cfg, "train")

        def batches(workers):
            dl = DataLoader(
                ds, batch_size=2, shuffle=True, drop_last=True, seed=7,
                num_workers=workers, prefetch=0,
            )
            return list(dl)

        b0, b2 = batches(0), batches(2)
        assert len(b0) == len(b2) > 0
        for x, y in zip(b0, b2):
            np.testing.assert_array_equal(x["input"], y["input"])
            np.testing.assert_array_equal(x["target"], y["target"])

    def test_extract_dir_used_for_zip_scratch(self, tmp_path, monkeypatch):
        """data.extract_dir is the ZIP extraction scratch root."""
        import video_to_video_diffusion_tpu.data.datasets as dsmod

        seen = {}
        real_mkdtemp = dsmod.tempfile.mkdtemp

        def spy(prefix=None, dir=None):
            seen["dir"] = dir
            return real_mkdtemp(prefix=prefix, dir=dir)

        monkeypatch.setattr(dsmod.tempfile, "mkdtemp", spy)
        # empty zip -> extraction happens, then the series lookup fails
        import zipfile

        zp = tmp_path / "case.zip"
        with zipfile.ZipFile(zp, "w"):
            pass
        with pytest.raises(ValueError):
            dsmod.preprocess_case(
                str(zp), str(tmp_path / "out.npz"),
                extract_dir=str(tmp_path / "scratch"),
            )
        assert seen["dir"] == str(tmp_path / "scratch")


class TestHardwareKnobs:
    def test_mesh_data_parallel_axis(self):
        from video_to_video_diffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(tensor_parallel=2, data_parallel=4)
        assert dict(mesh.shape) == {"data": 4, "tensor": 2}
        with pytest.raises(AssertionError):
            make_mesh(tensor_parallel=8, data_parallel=2)  # 16 > 8 devices

    def test_use_lpips_requires_weights_path(self, tmp_path):
        from video_to_video_diffusion_tpu.training.train_vae import VAETrainer

        cfg = _tiny(training={"use_lpips": True, "lpips_weight": 0.1})
        with pytest.raises(ValueError, match="perceptual_weights_path"):
            VAETrainer(cfg)


def test_validation_path_measures_pure_diffusion_loss():
    """step=None (the Trainer's _eval_loss path) must skip the gated aux
    term entirely: val/loss stays the pure epsilon-MSE objective, comparable
    to diffusion-only baselines and free of the per-batch VAE decode."""
    base_model = VideoToVideoDiffusion("tiny_test")
    params = base_model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32))
    ssim_model = VideoToVideoDiffusion(
        _tiny(losses={"use_ms_ssim_loss": True, "lambda_ssim": 0.3,
                      "ssim_every_n_steps": 1})  # gated on EVERY train step
    )
    v_in = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 32, 32, 1)) * 2 - 1
    v_gt = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 32, 32, 1)) * 2 - 1
    l_base, _ = base_model.loss_fn(params, v_in, v_gt, jax.random.PRNGKey(3))
    l_eval, m_eval = ssim_model.loss_fn(params, v_in, v_gt, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(l_eval), float(l_base), rtol=1e-6)
    assert "ms_ssim_loss" not in m_eval


def test_train_step_gates_on_optimizer_steps():
    """Gated aux losses must see the OPTIMIZER-step index: all micro-batches
    of one accumulation group share the same gate, so the convex
    (1-l)*mse + l*ssim combination applies uniformly within an update."""
    import optax
    from video_to_video_diffusion_tpu.training.state import (
        TrainState, make_train_step,
    )

    def probe_loss(p, batch, key, step=None):
        return (p["w"] ** 2).sum(), {"seen_step": jnp.asarray(step, jnp.int32)}

    tx = optax.MultiSteps(optax.sgd(1e-3), every_k_schedule=4)
    params = {"w": jnp.ones((2,))}
    state = TrainState(
        step=jnp.int32(0), params=params,
        opt_state=tx.init(params), ema_params=None,
    )
    step_fn = jax.jit(make_train_step(probe_loss, tx, accum_steps=4))
    seen = []
    for _ in range(8):
        state, metrics = step_fn(state, {}, jax.random.PRNGKey(0))
        seen.append(int(metrics["seen_step"]))
    assert seen == [0, 0, 0, 0, 1, 1, 1, 1], seen
