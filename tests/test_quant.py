"""w8a8 int8 inference path tests (CPU, tiny model).

The reference has no quantized path (pure fp torch, SURVEY §0); this is a
TPU-native capability addition targeting the v5e MXU's 2x int8 throughput.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.ops.conv import conv3d, conv3d_transpose
from video_to_video_diffusion_tpu.ops.quant import (
    int8_conv3d,
    int8_conv3d_transpose,
    quantize_activation_dynamic,
    quantize_kernel,
)


def test_quantize_kernel_roundtrip():
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 3, 4, 6))
    kq, scale = quantize_kernel(k)
    assert kq.dtype == jnp.int8
    assert scale.shape == (6,)
    deq = kq.astype(jnp.float32) * scale
    # symmetric rounding: per-element error bounded by half a quantization step
    err = np.abs(np.asarray(deq - k))
    assert (err <= np.asarray(scale)[None, None, None, None, :] * 0.5 + 1e-7).all()


def test_quantize_activation_dynamic_range():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 3)) * 5.0
    xq, sx = quantize_activation_dynamic(x)
    assert xq.dtype == jnp.int8
    deq = xq.astype(jnp.float32) * sx
    assert np.abs(np.asarray(deq - x)).max() <= float(sx) * 0.5 + 1e-6


@pytest.mark.parametrize("stride,padding", [(1, 1), ((1, 2, 2), (1, 1, 1))])
def test_int8_conv3d_matches_f32(stride, padding):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 4, 12, 12, 8))
    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 8, 16)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(4), (16,)) * 0.01
    ref = conv3d(x, k, b, stride=stride, padding=padding)
    kq, scale = quantize_kernel(k)
    out = int8_conv3d(x, kq, scale, b, stride=stride, padding=padding,
                      out_dtype=jnp.float32)
    assert out.shape == ref.shape
    rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02, rel


def test_int8_conv3d_transpose_matches_f32():
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8, 8, 8))
    k = jax.random.normal(jax.random.PRNGKey(6), (3, 4, 4, 8, 8)) * 0.1
    ref = conv3d_transpose(x, k, None, stride=(1, 2, 2), padding=(1, 1, 1),
                           output_padding=(0, 0, 0))
    kq, scale = quantize_kernel(k)
    out = int8_conv3d_transpose(x, kq, scale, None, stride=(1, 2, 2),
                                padding=(1, 1, 1), output_padding=(0, 0, 0),
                                out_dtype=jnp.float32)
    assert out.shape == ref.shape
    rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02, rel


@pytest.fixture(scope="module")
def tiny():
    from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion

    model = VideoToVideoDiffusion("tiny_test")
    params = model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32), batch=1)
    return model, params


def test_quantize_unet_params_structure(tiny):
    """Quantized tree: kernel -> kernel_q + kernel_scale on the heavy convs,
    every other leaf bitwise-identical to the trained tree."""
    from flax.traverse_util import flatten_dict

    model, params = tiny
    qparams = jax.jit(model.quantize_unet_params)(params)
    src = flatten_dict(params["unet"])
    dst = flatten_dict(qparams["unet"])
    n_q = sum(1 for p in dst if p[-1] == "kernel_q")
    assert n_q > 0
    for path, leaf in dst.items():
        if path[-1] == "kernel_q":
            assert leaf.dtype == jnp.int8
            assert path[:-1] + ("kernel",) in src
        elif path[-1] == "kernel_scale":
            assert path[:-1] + ("kernel",) in src
        else:
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(src[path]))


def test_unet_int8_forward_close_to_f32(tiny):
    model, params = tiny
    qparams = jax.jit(model.quantize_unet_params)(params)
    z = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 8, model.latent_dim))
    t = jnp.array([3, 7], jnp.int32)
    ref = model.apply_unet(params, z, t, z, f32=True)
    out = model.apply_unet_q(qparams, z, t, z)
    rel = np.linalg.norm(np.asarray(out - ref, np.float32)) / np.linalg.norm(
        np.asarray(ref, np.float32)
    )
    # dynamic per-tensor act quant + per-channel weight quant through a full
    # UNet: small but nonzero drift
    assert rel < 0.15, rel
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_generate_volume_int8(tiny):
    from video_to_video_diffusion_tpu.inference.pipeline import generate_volume

    model, params = tiny
    v = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 64, 64, 1))
    kw = dict(
        num_inference_steps=2, patch_size=(4, 32, 32),
        target_patch_size=(8, 32, 32), stride=(2, 16, 16), vae_batch=4,
    )
    fp = generate_volume(model, params, v, jax.random.PRNGKey(9), **kw)
    q = generate_volume(model, params, v, jax.random.PRNGKey(9), quant="int8", **kw)
    assert q.shape == fp.shape
    assert np.isfinite(np.asarray(q)).all()
    # same trajectory modulo quantization noise (tanh-bounded outputs)
    assert np.abs(np.asarray(q - fp)).mean() < 0.2
    with pytest.raises(ValueError, match="Unknown quant"):
        generate_volume(
            model, params, v, jax.random.PRNGKey(9), quant="fp4", **kw
        )


def test_int8_tree_memoized_per_params(tiny):
    """quant='int8' must quantize the UNet tree once per (model, params):
    an N-sample eval loop or a timed bench pays the whole-tree
    abs-max/round/scale pass a single time, not per generate call."""
    from video_to_video_diffusion_tpu.inference.pipeline import (
        _sample_params_and_apply,
    )

    model, params = tiny
    qp1, apply1 = _sample_params_and_apply(model, params, "int8")
    qp2, apply2 = _sample_params_and_apply(model, params, "int8")
    assert qp1 is qp2  # memoized tree, not a fresh quantization pass
    assert apply1 == apply2 == model.apply_unet_q
    fp, applyf = _sample_params_and_apply(model, params, None)
    assert fp is params and applyf == model.apply_unet
