"""Depth-axis (temporal) self-attention core — standalone dispatch.

NOT the production UNet path: models/unet3d.py::TemporalAttention inlines a
lane-aligned einsum formulation that fuses the head layout into the qkv/out
projections (measured faster on v5e — see docs/RESULTS.md). This module is
kept as (a) the portable reference implementation the tests pin numerics
against, (b) the Pallas opt-in (ops/pallas/depth_attention.py fuses
QK^T -> softmax -> AV in VMEM per (batch, head) tile; measured slower than
XLA's batched-dot lowering on v5e, re-benchmarkable via
scripts/bench_pallas.py), exercised by tests/test_pallas.py. Sequence
length is tiny (T <= 48 latent slices; reference models/unet3d.py:163-194).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Toggled by ops.pallas at import time on TPU backends.
_USE_PALLAS = False


def set_use_pallas(flag: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = bool(flag)


def depth_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Multi-head attention along axis -2.

    Args:
      q, k, v: (N, num_heads, T, head_dim) where N folds B*H*W.

    Returns:
      (N, num_heads, T, head_dim), same dtype as q.
    """
    if _USE_PALLAS:
        from video_to_video_diffusion_tpu.ops.pallas.depth_attention import (
            TILE_N,
        )

        if q.shape[0] % TILE_N == 0 and q.shape[2] % 8 == 0 and q.shape[3] % 8 == 0:
            return _depth_attention_pallas_vjp(q, k, v)
    return depth_attention_reference(q, k, v)


@jax.custom_vjp
def _depth_attention_pallas_vjp(q, k, v):
    """Pallas forward with a reference-implementation backward.

    The fused kernel is forward-only; grads recompute through the jnp path
    (standard remat-style tradeoff), which keeps enable_pallas() safe on
    training paths.
    """
    from video_to_video_diffusion_tpu.ops.pallas.depth_attention import (
        depth_attention_pallas,
    )

    out = depth_attention_pallas(q, k, v)
    return out if out is not None else depth_attention_reference(q, k, v)


def _attn_fwd(q, k, v):
    return _depth_attention_pallas_vjp(q, k, v), (q, k, v)


def _attn_bwd(residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(depth_attention_reference, q, k, v)
    return vjp(g)


_depth_attention_pallas_vjp.defvjp(_attn_fwd, _attn_bwd)


def depth_attention_reference(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    orig_dtype = q.dtype
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    logits = jnp.einsum(
        "nhqc,nhkc->nhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "nhqk,nhkc->nhqc",
        attn.astype(orig_dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)
