"""Volume resize ops matching torch `F.interpolate` semantics.

The reference uses trilinear align_corners=False interpolation to align
thick/thin latent depths (models/model.py:185-205, 278-296) and nearest
interpolation for mask downsampling (models/model.py:199-205). jax.image's
"trilinear" uses half-pixel centers — identical to align_corners=False; for
nearest we reproduce torch's floor(dst * scale) rule exactly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def resize_trilinear(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Trilinear resize of the (D, H, W) axes of an NDHWC tensor.

    Args:
      x: (B, D, H, W, C)
      size: target (D, H, W)
    """
    B, _, _, _, C = x.shape
    out_shape = (B, *size, C)
    return jax.image.resize(x.astype(jnp.float32), out_shape, method="trilinear").astype(
        x.dtype
    )


def resize_nearest(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Nearest resize of the (D, H, W) axes, torch 'nearest' index rule.

    torch maps output index i to input index floor(i * in/out); this preserves
    binary masks exactly (the reference relies on that, models/model.py:204).
    """
    _, D, H, W, _ = x.shape
    idx = []
    for in_dim, out_dim in zip((D, H, W), size):
        scale = in_dim / out_dim
        ix = jnp.floor(jnp.arange(out_dim) * scale).astype(jnp.int32)
        idx.append(jnp.clip(ix, 0, in_dim - 1))
    out = x[:, idx[0], :, :, :]
    out = out[:, :, idx[1], :, :]
    out = out[:, :, :, idx[2], :]
    return out


def space_to_depth(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Lossless spatial fold: (B, D, H, W, C) -> (B, D, H/f, W/f, f*f*C).

    Used by the residual-mode conditioning path: the trilinear-upsampled
    input volume is folded to the latent grid so the UNet sees the exact
    pixels (no learned encoder between input and conditioning), while every
    op stays a static reshape/transpose XLA folds into the consumer.
    """
    B, D, H, W, C = x.shape
    f = factor
    if H % f or W % f:
        raise ValueError(f"space_to_depth: ({H},{W}) not divisible by {f}")
    x = x.reshape(B, D, H // f, f, W // f, f, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, D, H // f, W // f, f * f * C)


def resize_depth_linear(x: jnp.ndarray, target_depth: int) -> jnp.ndarray:
    """Linear resize along depth only (common case: latent depth alignment)."""
    B, D, H, W, C = x.shape
    if D == target_depth:
        return x
    return resize_trilinear(x, (target_depth, H, W))
