"""Depth-axis (temporal) self-attention core.

The only attention in the system attends along the slice/depth axis with
H and W folded into batch (reference: models/unet3d.py:163-194). Sequence
length is tiny (T <= 48 latent slices), so the op is bandwidth-bound; the
Pallas path (ops/pallas/depth_attention.py) fuses QK^T -> softmax -> AV in
VMEM per (batch, head) tile. The jnp path below is the portable reference
implementation (softmax in f32 for bf16 safety).
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
            depth_attention_pallas,
        )

        out = depth_attention_pallas(q, k, v)
        if out is not None:
            return out
    return depth_attention_reference(q, k, v)


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
