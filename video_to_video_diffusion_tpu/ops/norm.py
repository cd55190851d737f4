"""GroupNorm (channels-last) with torch semantics.

Matches ``torch.nn.GroupNorm(num_groups, C, eps=1e-5)`` on NDHWC input:
statistics are computed in f32 over (D, H, W, C//G) per (batch, group) —
contiguous channel grouping, like torch. The reference normalizes with 8
groups in the VAE (models/vae.py:28) and an adaptive largest-divisor<=32
group count in the UNet (models/unet3d.py:62-68).

A fused Pallas groupnorm+SiLU kernel lives in ops/pallas/groupnorm_silu.py
as an opt-in alternative for inference paths (it has no custom backward);
this module is the default, fully differentiable implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adaptive_num_groups(channels: int) -> int:
    """Largest divisor of `channels` among [32, 16, 8, 4, 2, 1].

    Reference: models/unet3d.py:62-68 (`_get_num_groups`).
    """
    for groups in (32, 16, 8, 4, 2, 1):
        if channels % groups == 0:
            return groups
    return 1


def conv_block_num_groups(channels: int) -> int:
    """The reference UNet Conv3DBlock's DIFFERENT adaptive rule: prefer 8
    groups whenever the channel count is divisible by 8, else fall back to
    the largest-divisor rule (models/unet3d.py:57-68) — NOT the same as
    `adaptive_num_groups` (e.g. 128 channels -> 8 here, 32 there). Weight
    parity with reference checkpoints requires matching it exactly.
    """
    if channels % 8 == 0:
        return min(8, channels)
    return adaptive_num_groups(channels)


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    activation: str | None = None,
) -> jnp.ndarray:
    """GroupNorm over channels-last input of shape (B, ..., C).

    Stats in f32 regardless of input dtype (bf16-safe); output cast back to
    the input dtype. `activation` in {None, "silu"} optionally fuses the
    nonlinearity (XLA fuses this on its own; the flag also routes to the
    Pallas kernel on TPU for the big VAE blocks).
    """
    orig_dtype = x.dtype
    B = x.shape[0]
    C = x.shape[-1]
    assert C % num_groups == 0, f"channels {C} not divisible by groups {num_groups}"
    grouped = x.reshape(B, -1, num_groups, C // num_groups)
    # One-pass stats in f32: the casts fuse into the reductions so no f32
    # copy of the activation is ever materialized (a two-pass (x-mean)**2
    # formulation at bf16 costs a full-resolution f32 temp — 4.2 GB per
    # layer on the 48x192x192 decoder path).
    g32 = grouped.astype(jnp.float32)
    mean = jnp.mean(g32, axis=(1, 3), keepdims=True)
    var = jnp.maximum(
        jnp.mean(g32 * g32, axis=(1, 3), keepdims=True) - mean * mean, 0.0
    )
    inv = jax.lax.rsqrt(var + eps)
    normed = (grouped - mean.astype(orig_dtype)) * inv.astype(orig_dtype)
    normed = normed.reshape(x.shape)
    out = normed * scale.astype(orig_dtype) + bias.astype(orig_dtype)
    if activation == "silu":
        out = out * jax.nn.sigmoid(out)
    elif activation is not None:
        raise ValueError(f"unsupported activation {activation}")
    return out.astype(orig_dtype)
