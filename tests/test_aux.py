"""Aux module tests: generate wrappers, transforms, metric writer, profiler,
losses."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.data.transforms import (
    DenormalizeVideo,
    VideoAugmentation,
    VideoTransform,
    load_video,
    save_video,
)
from video_to_video_diffusion_tpu.inference.generate import (
    generate_batch,
    generate_video,
    interpolate_videos,
)
from video_to_video_diffusion_tpu.models.losses import (
    AutoencoderLoss,
    CombinedLoss,
    ms_ssim,
    ssim_2d,
)
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
from video_to_video_diffusion_tpu.utils.tb import MetricWriter


@pytest.fixture(scope="module")
def tiny():
    model = VideoToVideoDiffusion("tiny_test")
    params = model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32), batch=1)
    return model, params


def test_video_transform_range_and_size():
    frames = (np.random.default_rng(0).uniform(0, 255, (3, 40, 40)).astype(np.uint8))
    out = VideoTransform((32, 32))(frames)
    assert out.shape == (3, 32, 32, 1)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_video_augmentation_pairs():
    a = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    b = a * 2
    aug = VideoAugmentation(p_flip=1.0, seed=0)
    fa, fb = aug(a, b)
    np.testing.assert_array_equal(fa[:, :, ::-1], a)
    np.testing.assert_array_equal(fb, fa * 2)


def test_denormalize():
    v = np.array([-1.0, 0.0, 1.0], np.float32).reshape(1, 1, 3, 1)
    out = DenormalizeVideo()(v)
    np.testing.assert_allclose(out.ravel(), [0.0, 0.5, 1.0])


def test_save_load_video_npz(tmp_path):
    v = np.random.default_rng(0).uniform(-1, 1, (4, 8, 8, 1)).astype(np.float32)
    p = str(tmp_path / "vid.npz")
    save_video(v, p)
    back = load_video(p)
    np.testing.assert_array_equal(back, v)


def test_generate_video_roundtrip(tmp_path, tiny):
    model, params = tiny
    v = np.random.default_rng(1).uniform(-1, 1, (4, 32, 32, 1)).astype(np.float32)
    inp = str(tmp_path / "in.npy")
    outp = str(tmp_path / "out.npz")
    np.save(inp, v)
    out = generate_video(
        model, params, inp, outp, sampler="ddim", num_inference_steps=2,
        target_depth=8, size=(32, 32),
    )
    assert out.shape == (1, 8, 32, 32, 1)
    assert os.path.exists(outp)


def test_generate_batch_metrics(tiny):
    model, params = tiny
    v_in = np.random.default_rng(2).uniform(-1, 1, (2, 4, 32, 32, 1)).astype(np.float32)
    v_gt = np.random.default_rng(3).uniform(-1, 1, (2, 8, 32, 32, 1)).astype(np.float32)
    out = generate_batch(
        model, params, v_in, num_inference_steps=2, target_depth=8, targets=v_gt
    )
    assert out["videos"].shape == v_gt.shape
    assert "psnr" in out["metrics"]


def test_interpolate_videos(tiny):
    model, params = tiny
    va = np.random.default_rng(4).uniform(-1, 1, (1, 4, 32, 32, 1)).astype(np.float32)
    vb = np.random.default_rng(5).uniform(-1, 1, (1, 4, 32, 32, 1)).astype(np.float32)
    outs = interpolate_videos(model, params, va, vb, num_interpolations=3,
                              num_inference_steps=2)
    assert len(outs) == 3
    assert not np.allclose(outs[0], outs[-1])


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path / "logs"), use_tensorboard=False)
    w.add_scalar("train/loss", 0.5, 3)
    w.close()
    lines = open(tmp_path / "logs" / "metrics.jsonl").read().strip().splitlines()
    rec = json.loads(lines[0])
    assert rec["tag"] == "train/loss" and rec["step"] == 3


def test_ssim_loss_differentiable():
    x = jnp.linspace(0, 1, 16 * 16).reshape(1, 16, 16, 1)
    y = x * 0.9

    def loss(y):
        return 1.0 - ssim_2d(x, y)

    g = jax.grad(loss)(y)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_ms_ssim_range():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 1)).astype(np.float32))
    val = ms_ssim(x, x)
    assert 0.99 <= float(val) <= 1.0 + 1e-6
    y = jnp.clip(x + 0.3 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    assert float(ms_ssim(x, y)) < float(val)


def test_autoencoder_loss_gating():
    crit = AutoencoderLoss(use_ssim=True, ssim_weight=0.5, every_n_steps=2)
    recon = jnp.zeros((1, 4, 32, 32, 1))
    target = jnp.ones((1, 4, 32, 32, 1)) * 0.5
    l_on, aux_on = crit(recon, target, jnp.asarray(0))
    l_off, aux_off = crit(recon, target, jnp.asarray(1))
    assert float(aux_on["ssim_loss"]) > 0.0
    assert float(aux_off["ssim_loss"]) == 0.0
    assert float(l_on) > float(l_off)


def test_combined_loss_perceptual_term_additive_and_gated():
    """CombinedLoss adds lambda_p * VGG-feature loss on gated steps
    (reference models/losses.py:345-348) while SSIM keeps its convex form."""
    import jax
    import jax.numpy as jnp

    calls = []

    class FakePerceptual:
        def __call__(self, pred, target):
            calls.append(1)
            return jnp.float32(2.0)

    crit = CombinedLoss(
        lambda_ssim=0.0, perceptual=FakePerceptual(),
        lambda_perceptual=0.5, perceptual_every_n_steps=2,
    )
    diff = jnp.float32(1.0)
    pred = jnp.zeros((1, 2, 8, 8, 1))
    tgt = jnp.ones((1, 2, 8, 8, 1))
    l_on, aux_on = crit(diff, jnp.asarray(0), decoded_fn=lambda: (pred, tgt))
    l_off, aux_off = crit(diff, jnp.asarray(1), decoded_fn=lambda: (pred, tgt))
    assert float(l_on) == 1.0 + 0.5 * 2.0
    assert float(l_off) == 1.0
    assert float(aux_on["perceptual_loss"]) == 2.0


def test_profiler_noop():
    from video_to_video_diffusion_tpu.utils.profiler import step_annotation, trace_context

    with trace_context(None):
        with step_annotation("step", 0):
            pass
