"""VAE / UNet / composite-model shape, dtype and behavior tests (tiny configs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
from video_to_video_diffusion_tpu.models.unet3d import UNet3D
from video_to_video_diffusion_tpu.models.vae import SliceInterpolationVAE


@pytest.fixture(scope="module")
def tiny_model():
    model = VideoToVideoDiffusion("tiny_test")
    params = model.init(jax.random.PRNGKey(0), patch_shape=(4, 32, 32), batch=1)
    return model, params


def test_vae_shapes_4x_compression():
    """Depth preserved, spatial 4x (reference vae.py self-test :328-354)."""
    vae = SliceInterpolationVAE(in_channels=1, latent_dim=4, base_channels=8)
    x = jnp.zeros((1, 6, 32, 32, 1))
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    z = vae.apply({"params": params}, x, method=vae.encode)
    assert z.shape == (1, 6, 8, 8, 4)
    recon = vae.apply({"params": params}, z, method=vae.decode)
    assert recon.shape == x.shape
    assert vae.get_latent_shape(x.shape) == z.shape


def test_vae_8x_variant_is_config_change():
    vae = SliceInterpolationVAE(in_channels=1, latent_dim=4, base_channels=8, num_down_stages=3)
    x = jnp.zeros((1, 2, 32, 32, 1))
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    z = vae.apply({"params": params}, x, method=vae.encode)
    assert z.shape == (1, 2, 4, 4, 4)


def test_vae_output_bounded():
    vae = SliceInterpolationVAE(in_channels=1, latent_dim=4, base_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 16, 1)) * 10
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    recon, z = vae.apply({"params": params}, x)
    assert float(jnp.abs(recon).max()) <= 1.0  # tanh bound (vae.py:203)


def test_vae_scaling_factor_roundtrip():
    """encode multiplies, decode divides (reference vae.py:244-260)."""
    x = jnp.ones((1, 2, 16, 16, 1))
    v1 = SliceInterpolationVAE(in_channels=1, latent_dim=4, base_channels=8, scaling_factor=1.0)
    params = v1.init(jax.random.PRNGKey(0), x)["params"]
    v2 = SliceInterpolationVAE(in_channels=1, latent_dim=4, base_channels=8, scaling_factor=0.5)
    z1 = v1.apply({"params": params}, x, method=v1.encode)
    z2 = v2.apply({"params": params}, x, method=v2.encode)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1) * 0.5, rtol=1e-5)
    r1 = v1.apply({"params": params}, z1, method=v1.decode)
    r2 = v2.apply({"params": params}, z2, method=v2.decode)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_vae_posterior_split():
    vae = SliceInterpolationVAE(in_channels=1, latent_dim=4, base_channels=8)
    x = jnp.zeros((1, 2, 16, 16, 1))
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    mu, logvar = vae.apply({"params": params}, x, method=vae.encode_with_posterior)
    assert mu.shape == (1, 2, 4, 4, 2) and logvar.shape == mu.shape


def test_unet_shapes_and_conditioning():
    unet = UNet3D(latent_dim=4, model_channels=8, num_res_blocks=1,
                  attention_levels=(1,), channel_mult=(1, 2), num_heads=2,
                  time_embed_dim=32)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 4))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 4))
    t = jnp.asarray([0, 99], jnp.int32)
    params = unet.init(jax.random.PRNGKey(2), z, t, c)["params"]
    eps = unet.apply({"params": params}, z, t, c)
    assert eps.shape == z.shape
    assert np.isfinite(np.asarray(eps)).all()
    # conditioning must change the output
    eps2 = unet.apply({"params": params}, z, t, c + 1.0)
    assert not np.allclose(np.asarray(eps), np.asarray(eps2))
    # timestep must change the output
    eps3 = unet.apply({"params": params}, z, jnp.asarray([99, 0], jnp.int32), c)
    assert not np.allclose(np.asarray(eps), np.asarray(eps3))


def test_unet_gradient_checkpoint_same_output():
    kwargs = dict(latent_dim=2, model_channels=4, num_res_blocks=1,
                  attention_levels=(), channel_mult=(1, 2), num_heads=1,
                  time_embed_dim=16)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 2))
    t = jnp.zeros((1,), jnp.int32)
    u1 = UNet3D(use_checkpoint=False, **kwargs)
    u2 = UNet3D(use_checkpoint=True, **kwargs)
    p = u1.init(jax.random.PRNGKey(1), z, t, z)["params"]
    o1 = u1.apply({"params": p}, z, t, z)
    o2 = u2.apply({"params": p}, z, t, z)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_model_loss_finite_and_grad_flows(tiny_model):
    model, params = tiny_model
    v_in = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 32, 32, 1))
    v_gt = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 32, 32, 1))

    def loss(p):
        l, _ = model.loss_fn(p, v_in, v_gt, jax.random.PRNGKey(3))
        return l

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    unet_gnorm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["unet"])
    )
    vae_gnorm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["vae"])
    )
    assert unet_gnorm > 0.0  # UNet learns
    assert vae_gnorm == 0.0  # VAE encode is stop-gradient (reference model.py:180-183)


def test_model_full_volume_depth_mismatch(tiny_model):
    model, params = tiny_model
    v_in = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 32, 32, 1))
    v_gt = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 32, 32, 1))
    mask = jnp.ones((1, 6))
    loss, _ = model.loss_fn(params, v_in, v_gt, jax.random.PRNGKey(3), mask=mask)
    assert np.isfinite(float(loss))


def test_model_generate_shape_and_determinism(tiny_model):
    model, params = tiny_model
    v_in = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 32, 32, 1))
    gen = model.generate(params, v_in, jax.random.PRNGKey(8), "ddim", 3, target_depth=4)
    assert gen.shape == (1, 4, 32, 32, 1)
    assert np.isfinite(np.asarray(gen)).all()
    gen2 = model.generate(params, v_in, jax.random.PRNGKey(8), "ddim", 3, target_depth=4)
    np.testing.assert_array_equal(np.asarray(gen), np.asarray(gen2))


def test_count_parameters(tiny_model):
    model, params = tiny_model
    counts = model.count_parameters(params)
    assert counts["total"] == counts["vae"] + counts["unet"]
    assert counts["total"] > 0


def test_temporal_attention_matches_plain_sdpa():
    """The lane-aligned einsum formulation (TemporalAttention docstring) must
    equal plain per-site scaled-dot-product attention over depth in f32."""
    from video_to_video_diffusion_tpu.models.unet3d import TemporalAttention
    from video_to_video_diffusion_tpu.ops.norm import adaptive_num_groups, group_norm

    B, D, H, W, C, heads = 2, 6, 4, 4, 8, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D, H, W, C))
    attn = TemporalAttention(num_heads=heads)
    params = attn.init(jax.random.PRNGKey(1), x)["params"]
    got = np.asarray(attn.apply({"params": params}, x))

    # reference math: GN -> 1x1x1 conv qkv -> per-(h,w) SDPA over depth ->
    # 1x1x1 proj -> residual (reference models/unet3d.py:163-194, fixed AV)
    h = group_norm(x, params["norm"]["scale"], params["norm"]["bias"],
                   adaptive_num_groups(C), 1e-5)
    qkv = jnp.einsum("bdhwc,cf->bdhwf", h, params["qkv"]["kernel"][0, 0, 0])
    qkv = qkv + params["qkv"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def to_heads(a):
        Bq, Dq, Hq, Wq, Cq = a.shape
        a = a.reshape(Bq, Dq, Hq, Wq, heads, Cq // heads)
        return a.transpose(0, 2, 3, 4, 1, 5)  # (B,H,W,heads,D,c)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    logits = jnp.einsum("bhwnqc,bhwnkc->bhwnqk", qh, kh) * ((C // heads) ** -0.5)
    a = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhwnqk,bhwnkc->bhwnqc", a, vh)
    o = o.transpose(0, 4, 1, 2, 3, 5).reshape(B, D, H, W, C)
    want = jnp.einsum("bdhwc,cf->bdhwf", o, params["proj_out"]["kernel"][0, 0, 0])
    want = np.asarray(want + params["proj_out"]["bias"] + x)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_model_generate_edm_sampler(tiny_model):
    """model.generate routes sampler='edm' through the Karras-Heun path."""
    model, params = tiny_model
    v_in = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 32, 32, 1))
    gen = model.generate(params, v_in, jax.random.PRNGKey(8), "edm", 3, target_depth=4)
    assert gen.shape == (1, 4, 32, 32, 1)
    assert np.isfinite(np.asarray(gen)).all()
