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


def test_quantize_activation_static_matches_dynamic_at_true_amax():
    from video_to_video_diffusion_tpu.ops.quant import quantize_activation_static

    x = jax.random.normal(jax.random.PRNGKey(11), (2, 4, 8, 8, 3)) * 3.0
    xq_d, sx_d = quantize_activation_dynamic(x)
    amax = jnp.max(jnp.abs(x))
    xq_s, sx_s = quantize_activation_static(x, amax)
    np.testing.assert_array_equal(np.asarray(xq_d), np.asarray(xq_s))
    np.testing.assert_allclose(float(sx_d), float(sx_s), rtol=1e-6)
    # values beyond the calibrated amax saturate at +-127
    xq_c, _ = quantize_activation_static(x * 10.0, amax)
    assert int(np.abs(np.asarray(xq_c)).max()) == 127


def test_observe_unet_act_scales_fills_and_matches_dynamic(tiny):
    """Calibration forwards return the dynamic-path output exactly while
    recording every quant site's activation abs-max (> 0)."""
    model, params = tiny
    qparams = jax.jit(model.quantize_unet_params)(params)
    scales = model.init_unet_act_scales()
    leaves = jax.tree_util.tree_leaves(scales)
    assert len(leaves) > 0 and all(float(l) == 0.0 for l in leaves)

    z = jax.random.normal(jax.random.PRNGKey(12), (2, 8, 8, 8, model.latent_dim))
    t = jnp.array([3, 7], jnp.int32)
    eps_dyn = model.apply_unet_q(qparams, z, t, z)
    eps_obs, scales = model.observe_unet_act_scales(qparams, scales, z, t, z)
    np.testing.assert_array_equal(
        np.asarray(eps_obs, np.float32), np.asarray(eps_dyn, np.float32)
    )
    assert all(float(l) > 0.0 for l in jax.tree_util.tree_leaves(scales))

    # static apply with the calibrated scales stays close to dynamic: the
    # scales ARE this input's abs-max, so only f32-vs-calibrated rounding of
    # the scale itself can differ
    eps_static = model.apply_unet_q_static(
        dict(qparams, act_scales=scales), z, t, z
    )
    rel = np.linalg.norm(
        np.asarray(eps_static - eps_dyn, np.float32)
    ) / np.linalg.norm(np.asarray(eps_dyn, np.float32))
    assert rel < 1e-3, rel


def test_unet_static_quant_composes_with_remat(tiny):
    """quant_static's mutable act_scales collection must survive nn.remat
    (the medium config trains with gradient_checkpointing on, and the
    inference variants inherit use_checkpoint)."""
    import dataclasses

    model, params = tiny
    qparams = jax.jit(model.quantize_unet_params)(params)
    unet_r = dataclasses.replace(model.unet_int8_static, use_checkpoint=True)
    scales = model.init_unet_act_scales()
    z = jax.random.normal(jax.random.PRNGKey(13), (1, 8, 8, 8, model.latent_dim))
    t = jnp.zeros((1,), jnp.int32)
    eps, upd = unet_r.apply(
        {"params": qparams["unet"], "act_scales": scales},
        z, t, z, mutable=["act_scales"],
    )
    assert np.isfinite(np.asarray(eps, np.float32)).all()
    assert all(float(l) > 0.0 for l in jax.tree_util.tree_leaves(upd["act_scales"]))
    out = unet_r.apply(
        {"params": qparams["unet"], "act_scales": upd["act_scales"]}, z, t, z
    )
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_generate_volume_int8_static(tiny):
    """First int8_static ddim call calibrates (== the dynamic int8 sample
    bit-for-bit), memoizes the scales, and later calls run the static path."""
    from video_to_video_diffusion_tpu.inference import pipeline
    from video_to_video_diffusion_tpu.inference.pipeline import generate_volume

    model, params = tiny
    v = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 64, 64, 1))
    kw = dict(
        num_inference_steps=2, patch_size=(4, 32, 32),
        target_patch_size=(8, 32, 32), stride=(2, 16, 16), vae_batch=4,
    )
    pipeline._STAGE_CACHE.pop(("act_scales", id(model), id(params)), None)
    dyn = generate_volume(model, params, v, jax.random.PRNGKey(9), quant="int8", **kw)
    cal = generate_volume(
        model, params, v, jax.random.PRNGKey(9), quant="int8_static", **kw
    )
    # the calibration pass computes the dynamic trajectory (same math; the
    # scan bodies are distinct XLA programs, so allow last-ulp fusion drift)
    np.testing.assert_allclose(np.asarray(cal), np.asarray(dyn), atol=1e-4)
    sk = ("act_scales", id(model), id(params))
    assert sk in pipeline._STAGE_CACHE
    assert all(
        float(l) > 0.0
        for l in jax.tree_util.tree_leaves(pipeline._STAGE_CACHE[sk][1])
    )
    # Second call: static scales. The trajectory is NOT expected to track
    # the dynamic one tightly on this random-init tiny model: the static
    # scale at step 0 is the max over the whole calibration trajectory, so
    # its int8 rounding differs from the per-call dynamic scale, and a
    # random network amplifies that chaotically across DDIM steps. The
    # rigorous closeness contract is per-eval (rel<1e-3 in
    # test_observe_unet_act_scales...); here assert a loose sanity bound on
    # the decoded [-1,1] volumes plus finiteness.
    stat = generate_volume(
        model, params, v, jax.random.PRNGKey(9), quant="int8_static", **kw
    )
    assert np.isfinite(np.asarray(stat)).all()
    assert np.abs(np.asarray(stat - dyn)).mean() < 0.5
    # once calibrated, non-ddim samplers may run static too
    edm = generate_volume(
        model, params, v, jax.random.PRNGKey(9), quant="int8_static",
        sampler="edm", **kw
    )
    assert np.isfinite(np.asarray(edm)).all()


def test_int8_static_non_ddim_needs_calibration(tiny):
    """Without memoized scales, only ddim can calibrate; other samplers
    raise with guidance instead of silently running uncalibrated."""
    from video_to_video_diffusion_tpu.inference import pipeline

    model, params = tiny
    saved = pipeline._STAGE_CACHE.pop(("act_scales", id(model), id(params)), None)
    try:
        v = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 64, 64, 1))
        with pytest.raises(ValueError, match="calibrat"):
            pipeline.generate_volume(
                model, params, v, jax.random.PRNGKey(9), quant="int8_static",
                sampler="edm", num_inference_steps=2, patch_size=(4, 32, 32),
                target_patch_size=(8, 32, 32), stride=(2, 16, 16), vae_batch=4,
            )
    finally:
        if saved is not None:
            pipeline._STAGE_CACHE[("act_scales", id(model), id(params))] = saved


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


def test_quantize_vae_decoder_params_structure(tiny):
    """Decoder tree: kernel -> kernel_q/kernel_scale on res/upsample convs;
    the encoder subtree and the decoder's shape-critical ends
    (post_quant_conv, conv_out) stay bitwise-identical."""
    from flax.traverse_util import flatten_dict

    model, params = tiny
    qparams = jax.jit(model.quantize_vae_decoder_params)(params)
    src = flatten_dict(params["vae"])
    dst = flatten_dict(qparams["vae"])
    n_q = sum(1 for p in dst if p[-1] == "kernel_q")
    assert n_q > 0
    assert not any("encoder" in p and p[-1] == "kernel_q" for p in dst)
    for end in ("post_quant_conv", "conv_out"):
        assert ("decoder", end, "kernel") in dst
    for path, leaf in dst.items():
        if path[-1] == "kernel_q":
            assert leaf.dtype == jnp.int8
            assert path[:-1] + ("kernel",) in src
        elif path[-1] == "kernel_scale":
            assert path[:-1] + ("kernel",) in src
        else:
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(src[path]))


def test_decode_q_close_to_fp(tiny):
    """int8 decode tracks the fp decode closely on a smooth latent (the
    tanh-bounded output keeps errors in [-1,1] scale)."""
    model, params = tiny
    qparams = jax.jit(model.quantize_vae_decoder_params)(params)
    z = jax.random.normal(jax.random.PRNGKey(21), (2, 4, 8, 8, model.latent_dim))
    ref = np.asarray(model.decode(params, z), np.float32)
    out = np.asarray(model.decode_q(qparams, z), np.float32)
    assert out.shape == ref.shape
    assert np.isfinite(out).all()
    assert np.abs(out - ref).mean() < 0.05


def test_generate_volume_quant_vae(tiny):
    """quant_vae='int8' composes with the int8 UNet scan end-to-end and the
    decoded volume stays close to the fp-decode run with the same key."""
    from video_to_video_diffusion_tpu.inference.pipeline import generate_volume

    model, params = tiny
    v = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 64, 64, 1))
    kw = dict(
        num_inference_steps=2, patch_size=(4, 32, 32),
        target_patch_size=(8, 32, 32), stride=(2, 16, 16), vae_batch=4,
        quant="int8",
    )
    ref = generate_volume(model, params, v, jax.random.PRNGKey(9), **kw)
    out = generate_volume(
        model, params, v, jax.random.PRNGKey(9), quant_vae="int8", **kw
    )
    assert out.shape == ref.shape
    assert np.isfinite(np.asarray(out)).all()
    # same latents (same key + same int8 UNet scan); only the decode differs
    assert np.abs(np.asarray(out - ref)).mean() < 0.05


def test_quant_vae_unknown_mode_raises(tiny):
    from video_to_video_diffusion_tpu.inference.pipeline import (
        _decode_params_and_apply,
    )

    model, params = tiny
    with pytest.raises(ValueError, match="quant_vae"):
        _decode_params_and_apply(model, params, "int4")
    qp1, d1 = _decode_params_and_apply(model, params, "int8")
    qp2, d2 = _decode_params_and_apply(model, params, "int8")
    assert qp1 is qp2 and d1 == d2 == model.decode_q


def test_unet_int8_attention_matmuls_close_and_calibratable(tiny):
    """quant_attention_matmuls: the q@k^T / attn@v einsums run int8 (VERDICT
    r3 #6). Dynamic output must stay close to the projections-only int8
    path; static calibration must add amax_q/k/v sites and reproduce the
    dynamic trajectory's output shape/finiteness."""
    import dataclasses

    from flax.traverse_util import flatten_dict

    model, params = tiny
    qparams = jax.jit(model.quantize_unet_params)(params)
    z = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 8, model.latent_dim))
    t = jnp.array([3, 7], jnp.int32)
    base = model.apply_unet_q(qparams, z, t, z)

    unet_mm = dataclasses.replace(model.unet_int8, quant_matmuls=True)
    out = unet_mm.apply({"params": qparams["unet"]}, z, t, z)
    rel = np.linalg.norm(np.asarray(out - base, np.float32)) / np.linalg.norm(
        np.asarray(base, np.float32)
    )
    assert rel < 0.15, rel
    assert np.isfinite(np.asarray(out, np.float32)).all()

    # static variant: calibration records the three new per-attention sites
    unet_mm_static = dataclasses.replace(
        model.unet_int8_static, quant_matmuls=True
    )
    scales0 = jax.eval_shape(
        lambda: unet_mm_static.init(
            jax.random.PRNGKey(0), z, t, z
        )["act_scales"]
    )
    scales0 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), scales0)
    eps_obs, upd = unet_mm_static.apply(
        {"params": qparams["unet"], "act_scales": scales0},
        z, t, z, mutable=["act_scales"],
    )
    flat = flatten_dict(upd["act_scales"])
    names = {p[-1] for p in flat}
    assert {"amax_q", "amax_k", "amax_v"} <= names
    assert all(float(l) > 0.0 for l in jax.tree_util.tree_leaves(upd["act_scales"]))
    out_static = unet_mm_static.apply(
        {"params": qparams["unet"], "act_scales": upd["act_scales"]}, z, t, z
    )
    assert out_static.shape == base.shape
    assert np.isfinite(np.asarray(out_static, np.float32)).all()
