"""Shared Flax building blocks (NDHWC, f32 params / configurable compute dtype).

These are the 3D conv / norm / residual primitives both the VAE and the UNet
are assembled from (reference: models/vae.py:22-97, models/unet3d.py:51-134).
Weight init matches torch Conv3d defaults (kaiming-uniform a=sqrt(5), bias
uniform ±1/sqrt(fan_in)) so fresh training dynamics are comparable.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.ops.conv import conv3d, conv3d_transpose, _triple
from video_to_video_diffusion_tpu.ops.norm import adaptive_num_groups, group_norm

Dtype = Any

# torch kaiming_uniform(a=sqrt(5)) == uniform(±sqrt(1/fan_in))
_KERNEL_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _bias_init_for_fan_in(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def observe_or_read_amax(mod: nn.Module, x: jnp.ndarray, name: str = "amax"):
    """Static-activation-scale bookkeeping for w8a8 quant sites.

    Each quant site owns an ``act_scales`` variable holding the calibrated
    per-tensor activation abs-max. Two modes, keyed off collection
    mutability:

    - calibration (``mutable=['act_scales']`` on apply): record
      ``max(old, abs(x).max())`` and return None — the caller falls back to
      dynamic quantization for this call, so calibration outputs equal the
      dynamic path's while observing true trajectory activations.
    - inference (collection passed read-only): return the calibrated abs-max
      for quantize_activation_static.
    """
    v = mod.variable("act_scales", name, lambda: jnp.zeros((), jnp.float32))
    if mod.is_mutable_collection("act_scales"):
        v.value = jnp.maximum(v.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
        return None
    return v.value


class Conv3D(nn.Module):
    """3D conv, torch Conv3d shape semantics, NDHWC.

    With ``quant=True`` the module becomes the w8a8 inference variant: its
    parameters are ``kernel_q`` (int8) + ``kernel_scale`` (per-out-channel
    f32) instead of ``kernel``, produced from a trained f32 tree by
    ``models.quantize.quantize_unet_params`` (see ops/quant.py for the
    scheme and measured speedups). Bias is shared unquantized.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False
    # Zero-init kernel AND bias (standard diffusion-UNet tail trick): the
    # layer starts as the identity-to-zero map so the enclosing network's
    # initial output is exactly 0. Initialization-only — loaded checkpoints
    # override it; the parameter tree is unchanged.
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = _triple(self.kernel_size)
        in_ch = x.shape[-1]
        fan_in = in_ch * ks[0] * ks[1] * ks[2]
        kshape = (*ks, in_ch, self.features)
        bias_init = (
            nn.initializers.zeros if self.zero_init else _bias_init_for_fan_in(fan_in)
        )
        bias = (
            self.param("bias", bias_init, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if self.quant:
            from video_to_video_diffusion_tpu.ops.quant import int8_conv3d

            kernel_q = self.param(
                "kernel_q", nn.initializers.zeros, kshape, jnp.int8
            )
            kernel_scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            x_amax = observe_or_read_amax(self, x) if self.quant_static else None
            return int8_conv3d(
                x, kernel_q, kernel_scale, bias,
                stride=self.stride, padding=self.padding, out_dtype=self.dtype,
                x_amax=x_amax,
            )
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else _KERNEL_INIT,
            kshape,
            jnp.float32,
        )
        y = conv3d(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            bias.astype(self.dtype) if bias is not None else None,
            stride=self.stride,
            padding=self.padding,
        )
        return y


class ConvTranspose3D(nn.Module):
    """3D transposed conv, torch ConvTranspose3d shape semantics, NDHWC."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    output_padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = _triple(self.kernel_size)
        in_ch = x.shape[-1]
        # torch ConvTranspose fan_in counts the *output-channel* side of the
        # stored (in, out, k, k, k) weight: fan_in = out_ch * prod(k)? No —
        # torch uses weight.size(1) * receptive field = out * k^3 for the
        # bias bound; we mirror that.
        fan_in = self.features * ks[0] * ks[1] * ks[2]
        kshape = (*ks, in_ch, self.features)
        bias = (
            self.param("bias", _bias_init_for_fan_in(fan_in), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if self.quant:
            from video_to_video_diffusion_tpu.ops.quant import int8_conv3d_transpose

            kernel_q = self.param(
                "kernel_q", nn.initializers.zeros, kshape, jnp.int8
            )
            kernel_scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            x_amax = observe_or_read_amax(self, x) if self.quant_static else None
            return int8_conv3d_transpose(
                x, kernel_q, kernel_scale, bias,
                stride=self.stride, padding=self.padding,
                output_padding=self.output_padding, out_dtype=self.dtype,
                x_amax=x_amax,
            )
        kernel = self.param("kernel", _KERNEL_INIT, kshape, jnp.float32)
        return conv3d_transpose(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            bias.astype(self.dtype) if bias is not None else None,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class GroupNorm(nn.Module):
    """GroupNorm with torch eps, stats in f32, optional fused SiLU."""

    num_groups: int = 8
    epsilon: float = 1e-5
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm(
            x, scale, bias, self.num_groups, self.epsilon, self.activation
        )


class Conv3DBlock(nn.Module):
    """conv(k3 s1 p1 by default) -> GroupNorm -> SiLU.

    Reference: models/vae.py:22-35 (fixed 8 groups) and models/unet3d.py:51-74
    (adaptive groups) — controlled by `adaptive_groups`.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    num_groups: int = 8
    adaptive_groups: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from video_to_video_diffusion_tpu.ops.norm import conv_block_num_groups

        groups = (
            conv_block_num_groups(self.features) if self.adaptive_groups else self.num_groups
        )
        x = Conv3D(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            dtype=self.dtype,
            quant=self.quant,
            quant_static=self.quant_static,
            name="conv",
        )(x)
        x = GroupNorm(num_groups=groups, activation="silu", name="norm")(x)
        return x


class ResBlock3D(nn.Module):
    """Two-conv residual block, SiLU on the sum (reference models/vae.py:38-56)."""

    features: int
    num_groups: int = 8
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        h = Conv3DBlock(
            self.features, num_groups=self.num_groups, dtype=self.dtype,
            quant=self.quant, quant_static=self.quant_static, name="conv1"
        )(x)
        h = Conv3D(self.features, 3, 1, 1, dtype=self.dtype, quant=self.quant,
                   quant_static=self.quant_static, name="conv2")(h)
        h = GroupNorm(num_groups=self.num_groups, name="norm2")(h)
        h = h + residual
        return (h * jax.nn.sigmoid(h)).astype(h.dtype)  # SiLU


class DownsampleBlock(nn.Module):
    """Spatial 2x down: conv k=(3,4,4) s=(1,2,2) p=1 + GN + SiLU (vae.py:59-76)."""

    features: int
    num_groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv3D(
            self.features, (3, 4, 4), (1, 2, 2), (1, 1, 1), dtype=self.dtype, name="conv"
        )(x)
        return GroupNorm(num_groups=self.num_groups, activation="silu", name="norm")(x)


class UpsampleBlock(nn.Module):
    """Spatial 2x up: convT k=(3,4,4) s=(1,2,2) p=1 + GN + SiLU (vae.py:79-97)."""

    features: int
    num_groups: int = 8
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvTranspose3D(
            self.features, (3, 4, 4), (1, 2, 2), (1, 1, 1), dtype=self.dtype,
            quant=self.quant, quant_static=self.quant_static, name="conv"
        )(x)
        return GroupNorm(num_groups=self.num_groups, activation="silu", name="norm")(x)


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal timestep embedding (reference models/unet3d.py:18-32).

    Args:
      t: (B,) float or int timesteps.
    Returns:
      (B, dim) f32.
    """
    half_dim = dim // 2
    freqs = jnp.exp(
        jnp.arange(half_dim, dtype=jnp.float32) * -(jnp.log(10000.0) / (half_dim - 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
