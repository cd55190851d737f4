"""Pallas kernel correctness in interpret mode (CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.ops.norm import group_norm
from video_to_video_diffusion_tpu.ops.attention import depth_attention_reference
from video_to_video_diffusion_tpu.ops.pallas.groupnorm_silu import (
    _pick_tile,
    group_norm_silu_pallas,
)
from video_to_video_diffusion_tpu.ops.pallas.depth_attention import (
    depth_attention_pallas,
)


def test_pick_tile_divides_and_fits():
    assert _pick_tile(48 * 48 * 48, 128) is not None
    t = _pick_tile(110592, 512)
    assert t is not None and 110592 % t == 0
    assert t * 512 * 4 <= 4 * 1024 * 1024


def test_groupnorm_silu_matches_reference_interpret():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 128), dtype=np.float32))
    scale = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    got = group_norm_silu_pallas(x, scale, bias, num_groups=32, interpret=True)
    assert got is not None
    want = group_norm(x, scale, bias, num_groups=32, activation="silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_groupnorm_silu_bf16_io():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 128)).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.ones(128)
    bias = jnp.zeros(128)
    got = group_norm_silu_pallas(x, scale, bias, num_groups=8, interpret=True)
    assert got is not None and got.dtype == jnp.bfloat16
    want = group_norm(x, scale, bias, num_groups=8, activation="silu")
    # the jnp path normalizes in bf16 (memory-optimal) while the pallas
    # kernel normalizes in f32 before the final cast — one-ulp bf16 skew
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=6e-2
    )


def test_groupnorm_silu_fallback_on_bad_channels():
    # C not a lane multiple -> decline, caller falls back
    x = jnp.zeros((1, 2, 4, 4, 48))
    assert group_norm_silu_pallas(x, jnp.ones(48), jnp.zeros(48), 8, interpret=True) is None


def test_depth_attention_pallas_matches_reference_interpret():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((32, 2, 48, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((32, 2, 48, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((32, 2, 48, 32), dtype=np.float32))
    got = depth_attention_pallas(q, k, v, interpret=True)
    assert got is not None
    want = depth_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_depth_attention_pallas_fallback_on_bad_batch():
    q = jnp.zeros((10, 2, 48, 32))  # N not divisible by TILE_N
    assert depth_attention_pallas(q, q, q, interpret=True) is None


def test_pallas_attention_vjp_matches_reference():
    """enable_pallas must be training-safe: grads flow via the jnp backward."""
    import jax
    from video_to_video_diffusion_tpu.ops import attention as attn_mod

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((16, 2, 48, 32), dtype=np.float32))

    def loss_ref(q):
        return jnp.sum(attn_mod.depth_attention_reference(q, q, q) ** 2)

    def loss_vjp(q):
        return jnp.sum(attn_mod._depth_attention_pallas_vjp(q, q, q) ** 2)

    g_ref = jax.grad(loss_ref)(q)
    g_vjp = jax.grad(loss_vjp)(q)  # pallas fwd in interpret-less CPU -> falls back
    np.testing.assert_allclose(np.asarray(g_vjp), np.asarray(g_ref), atol=1e-4)
