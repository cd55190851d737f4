"""Numerical parity of core ops against torch (CPU reference)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from video_to_video_diffusion_tpu.ops.conv import conv3d, conv3d_transpose
from video_to_video_diffusion_tpu.ops.norm import adaptive_num_groups, group_norm
from video_to_video_diffusion_tpu.ops.resize import resize_nearest, resize_trilinear
from video_to_video_diffusion_tpu.ops.layout import ncdhw_to_ndhwc, ndhwc_to_ncdhw


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_conv3d_matches_torch_k3s1p1(rng):
    x = rng.standard_normal((2, 4, 6, 6, 3), dtype=np.float32)
    w = rng.standard_normal((3, 3, 3, 3, 5), dtype=np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1, 1))
    want = (
        F.conv3d(
            torch.from_numpy(x.copy()).permute(0, 4, 1, 2, 3),
            torch.from_numpy(w.copy()).permute(4, 3, 0, 1, 2),
            torch.from_numpy(b.copy()),
            stride=1,
            padding=1,
        )
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv3d_matches_torch_strided_downsample(rng):
    """The k=(3,4,4) s=(1,2,2) p=1 downsample conv (reference vae.py:59-76)."""
    x = rng.standard_normal((1, 5, 8, 8, 4), dtype=np.float32)
    w = rng.standard_normal((3, 4, 4, 4, 8), dtype=np.float32)
    got = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), None, (1, 2, 2), (1, 1, 1)))
    want = (
        F.conv3d(
            torch.from_numpy(x.copy()).permute(0, 4, 1, 2, 3),
            torch.from_numpy(w.copy()).permute(4, 3, 0, 1, 2),
            stride=(1, 2, 2),
            padding=(1, 1, 1),
        )
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    assert got.shape == (1, 5, 4, 4, 8)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv3d_transpose_matches_torch(rng):
    """The transposed upsample conv (reference vae.py:79-97): 2x spatial, depth kept."""
    x = rng.standard_normal((1, 5, 4, 4, 8), dtype=np.float32)
    w = rng.standard_normal((3, 4, 4, 8, 4), dtype=np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    got = np.asarray(
        conv3d_transpose(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), (1, 2, 2), (1, 1, 1))
    )
    want = (
        F.conv_transpose3d(
            torch.from_numpy(x.copy()).permute(0, 4, 1, 2, 3),
            torch.from_numpy(w.copy()).permute(3, 4, 0, 1, 2),  # (in,out,k,k,k)
            torch.from_numpy(b.copy()),
            stride=(1, 2, 2),
            padding=(1, 1, 1),
        )
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    assert got.shape == (1, 5, 8, 8, 4)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 3, 5, 5, 8), dtype=np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 4))
    gn = torch.nn.GroupNorm(4, 8)
    gn.weight.data = torch.from_numpy(scale.copy())
    gn.bias.data = torch.from_numpy(bias.copy())
    want = (
        gn(torch.from_numpy(x.copy()).permute(0, 4, 1, 2, 3))
        .detach()
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_group_norm_bf16_stats_in_f32(rng):
    x = rng.standard_normal((1, 2, 4, 4, 8), dtype=np.float32)
    scale = np.ones(8, np.float32)
    bias = np.zeros(8, np.float32)
    out = group_norm(jnp.asarray(x, jnp.bfloat16), jnp.asarray(scale), jnp.asarray(bias), 4)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_adaptive_num_groups():
    # reference unet3d.py:62-68
    assert adaptive_num_groups(128) == 32
    assert adaptive_num_groups(48) == 16
    assert adaptive_num_groups(8) == 8
    assert adaptive_num_groups(6) == 2
    assert adaptive_num_groups(7) == 1


def test_resize_trilinear_matches_torch(rng):
    v = rng.standard_normal((1, 4, 6, 6, 2), dtype=np.float32)
    got = np.asarray(resize_trilinear(jnp.asarray(v), (12, 6, 6)))
    want = (
        F.interpolate(
            torch.from_numpy(v.copy()).permute(0, 4, 1, 2, 3),
            size=(12, 6, 6),
            mode="trilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_nearest_matches_torch(rng):
    v = rng.standard_normal((1, 4, 6, 6, 1), dtype=np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(v), (2, 3, 3)))
    want = (
        F.interpolate(
            torch.from_numpy(v.copy()).permute(0, 4, 1, 2, 3), size=(2, 3, 3), mode="nearest"
        )
        .permute(0, 2, 3, 4, 1)
        .numpy()
    )
    np.testing.assert_array_equal(got, want)


def test_resize_nearest_preserves_binary_mask(rng):
    m = (rng.uniform(size=(1, 8, 1, 1, 1)) > 0.5).astype(np.float32)
    out = np.asarray(resize_nearest(jnp.asarray(m), (4, 1, 1)))
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_layout_roundtrip(rng):
    x = rng.standard_normal((2, 3, 4, 5, 6), dtype=np.float32)
    y = ndhwc_to_ncdhw(ncdhw_to_ndhwc(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(y), x)


def test_depth_attention_matches_einsum_reference(rng):
    from video_to_video_diffusion_tpu.ops.attention import depth_attention_reference

    q = jnp.asarray(rng.standard_normal((4, 2, 6, 8), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((4, 2, 6, 8), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((4, 2, 6, 8), dtype=np.float32))
    got = np.asarray(depth_attention_reference(q, k, v))
    # Correct scaled-dot-product attention in torch. NOTE: the reference's
    # own einsum ('bhqk,bhvc->bhqc', unet3d.py:185) is buggy — 'k' and 'v'
    # are summed independently so it degenerates to a value-sum; we build the
    # intended attention ('bhqk,bhkc->bhqc') instead.
    qt, kt, vt = (torch.from_numpy(np.asarray(a).copy()) for a in (q, k, v))
    attn = torch.softmax(torch.einsum("bhqc,bhkc->bhqk", qt, kt) * (8 ** -0.5), dim=-1)
    want = torch.einsum("bhqk,bhkc->bhqc", attn, vt).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
