"""Conditional 3D UNet denoiser (TPU/Flax).

Capability parity with the reference `UNet3D` (models/unet3d.py:227-413):
epsilon-prediction on NDHWC latents, conditioned by channel-concat of the
noisy latent and the conditioning latent (reference :372), timestep embedding
injected per ResBlock (:122-125), depth-axis self-attention at configured
levels (:136-194), skip concat only on the first block of each decoder level
(:296-317), spatial-only down/upsampling (:197-224).

TPU specifics: channels-last everywhere; attention folds H,W into a site
axis and keeps every einsum contraction lane/sublane-aligned with
compute-dtype logits (see TemporalAttention docstring for measurements);
gradient checkpointing is `nn.remat` per block (the XLA analogue of the
reference's torch.utils.checkpoint at :342-355).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.models.layers import (
    Conv3D,
    Conv3DBlock,
    ConvTranspose3D,
    GroupNorm,
    sinusoidal_time_embedding,
)
from video_to_video_diffusion_tpu.ops.norm import adaptive_num_groups

Dtype = Any


class TimeEmbedding(nn.Module):
    """sinusoidal -> Linear -> SiLU -> Linear (reference unet3d.py:35-48)."""

    model_channels: int
    time_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = sinusoidal_time_embedding(t, self.model_channels)
        emb = nn.Dense(self.time_dim, dtype=self.dtype, name="fc1")(emb.astype(self.dtype))
        emb = emb * jax.nn.sigmoid(emb)
        emb = nn.Dense(self.time_dim, dtype=self.dtype, name="fc2")(emb)
        return emb


class ResBlockT(nn.Module):
    """Residual block with timestep-embedding injection (unet3d.py:77-133).

    `quant` switches the two 3x3x3 convs (where the FLOPs are) to the w8a8
    int8 path; the 1x1x1 residual projection and time MLP stay at the
    compute dtype (cheap, and the residual stream is precision-sensitive).
    """

    features: int
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        if in_ch != self.features:
            residual = Conv3D(self.features, 1, 1, 0, dtype=self.dtype, name="residual_conv")(x)
        else:
            residual = x
        h = Conv3DBlock(
            self.features, adaptive_groups=True, dtype=self.dtype,
            quant=self.quant, quant_static=self.quant_static, name="conv1"
        )(x)
        # time injection: SiLU -> Dense -> broadcast add (unet3d.py:122-125)
        t = temb * jax.nn.sigmoid(temb)
        t = nn.Dense(self.features, dtype=self.dtype, name="time_mlp")(t)
        h = h + t[:, None, None, None, :]
        h = Conv3D(self.features, 3, 1, 1, dtype=self.dtype, quant=self.quant,
                   quant_static=self.quant_static, name="conv2")(h)
        h = GroupNorm(num_groups=adaptive_num_groups(self.features), name="norm2")(h)
        h = h + residual
        return (h * jax.nn.sigmoid(h)).astype(h.dtype)


class _ConvParams(nn.Module):
    """Parameter holder matching Conv3D's tree paths/shapes/inits.

    Lets TemporalAttention keep checkpoint-compatible 1x1x1-conv parameters
    (qkv/kernel (1,1,1,C,3C) etc. — what convert_torch_checkpoint.py writes)
    while consuming them through einsums instead of conv calls.
    """

    features: int
    in_channels: int
    quant: bool = False

    @nn.compact
    def __call__(self):
        from video_to_video_diffusion_tpu.models.layers import (
            _KERNEL_INIT,
            _bias_init_for_fan_in,
        )

        kshape = (1, 1, 1, self.in_channels, self.features)
        bias = self.param(
            "bias", _bias_init_for_fan_in(self.in_channels), (self.features,),
            jnp.float32,
        )
        if self.quant:
            # w8a8 variant: same leaves the conv modules use, so
            # models/quantize.quantize_params_like fills them structurally.
            kernel_q = self.param("kernel_q", nn.initializers.zeros, kshape, jnp.int8)
            kernel_scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            return (kernel_q, kernel_scale), bias
        kernel = self.param("kernel", _KERNEL_INIT, kshape, jnp.float32)
        return kernel, bias


class TemporalAttention(nn.Module):
    """Self-attention along the depth axis, H/W folded into batch (unet3d.py:136-194).

    Deliberate divergence #1: the reference's value-application einsum
    ('bhqk,bhvc->bhqc', unet3d.py:185) sums over 'k' and 'v' *independently*,
    which — since softmax rows sum to 1 — degenerates to a plain sum of the
    values and discards the attention weights. We implement the intended
    scaled-dot-product attention ('bhqk,bhkc->bhqc').

    TPU formulation (measured on v5e, scripts/bench_attn_block.py): the
    qkv/proj 1x1x1 convs are algebraically dots, so the projections emit the
    head layout (b, heads, site, depth, head_dim) directly and the attention
    einsums keep every contraction on the minor (lane/sublane) axes; logits
    are materialized in the compute dtype (bf16 under the inference/training
    policy) with the softmax still reduced in f32. vs the
    rearrange-to-(BHW,hd,D,c) formulation this is 52.3 -> 33.5 ms at UNet L1
    and 18.1 -> 14.3 ms at L2 (batch 25) — the explicit head
    transposes were costing more than the attention math itself.
    """

    num_heads: int = 4
    dtype: Dtype = jnp.float32
    # w8a8 int8 variant for the qkv/out projections (where the attention
    # block's MXU FLOPs are); the logits/softmax/value path stays at the
    # compute dtype with an f32 softmax. Parameter tree gains the same
    # kernel_q/kernel_scale leaves the quantized convs use.
    quant: bool = False
    # static (calibrated) activation scales: two act_scales variables, one
    # per projection input (see layers.observe_or_read_amax).
    quant_static: bool = False
    # Also run the attention matmuls themselves (q@k^T logits and attn@v)
    # on the int8 MXU path (VERDICT r3 #6: the sample-stage gap to int8
    # peak is the still-bf16 attention + dynamic-quant HBM passes). q/k/v
    # are quantized per-tensor (dynamic, or calibrated amax_q/k/v sites
    # under quant_static); the softmax output needs NO reduction — its
    # range is [0, 1] by construction, so the scale is the constant 1/127.
    # The softmax itself stays f32.
    quant_matmuls: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        assert C % self.num_heads == 0, "num_heads must divide channels"
        hd, e = self.num_heads, C // self.num_heads
        residual = x
        h = GroupNorm(num_groups=adaptive_num_groups(C), name="norm")(x)

        wqkv, bqkv = _ConvParams(C * 3, C, quant=self.quant, name="qkv")()
        wo, bo = _ConvParams(C, C, quant=self.quant, name="proj_out")()
        dt = self.dtype
        xs = h.reshape(B, D, H * W, C).astype(dt)
        b3 = bqkv.astype(jnp.float32).reshape(3, hd, e)[:, None, :, None, None, :]
        if self.quant:
            from video_to_video_diffusion_tpu.models.layers import observe_or_read_amax
            from video_to_video_diffusion_tpu.ops.quant import (
                int8_einsum,
                quantize_activation_dynamic,
                quantize_activation_static,
            )

            wqkv_q, sqkv = wqkv
            w3q = wqkv_q[0, 0, 0].reshape(C, 3, hd, e)
            s3 = sqkv.reshape(3, hd, e)[:, None, :, None, None, :]
            amax_qkv = (
                observe_or_read_amax(self, xs, "amax_qkv") if self.quant_static else None
            )
            if amax_qkv is None:
                xq, sx = quantize_activation_dynamic(xs)
            else:
                xq, sx = quantize_activation_static(xs, amax_qkv)
            qkv = [
                (int8_einsum("bdsc,che->bhsde", xq, sx * s3[i], w3q[:, i], 1.0)
                 + b3[i]).astype(dt)
                for i in range(3)
            ]
            q, k, v = qkv
        else:
            w3 = wqkv[0, 0, 0].astype(dt).reshape(C, 3, hd, e)
            q = jnp.einsum("bdsc,che->bhsde", xs, w3[:, 0]) + b3[0].astype(dt)
            k = jnp.einsum("bdsc,che->bhsde", xs, w3[:, 1]) + b3[1].astype(dt)
            v = jnp.einsum("bdsc,che->bhsde", xs, w3[:, 2]) + b3[2].astype(dt)

        if self.quant and self.quant_matmuls:
            from video_to_video_diffusion_tpu.models.layers import observe_or_read_amax
            from video_to_video_diffusion_tpu.ops.quant import (
                int8_einsum,
                quantize_activation_dynamic,
                quantize_activation_static,
            )

            def _act_q(a, name):
                amax = (
                    observe_or_read_amax(self, a, name) if self.quant_static else None
                )
                if amax is None:
                    return quantize_activation_dynamic(a)
                return quantize_activation_static(a, amax)

            qq, sq = _act_q(q, "amax_q")
            kq, sk = _act_q(k, "amax_k")
            vq, sv = _act_q(v, "amax_v")
            logits = int8_einsum("bhsde,bhsfe->bhsdf", qq, sq, kq, sk) * (e ** -0.5)
            attn = jax.nn.softmax(logits, axis=-1)  # already f32
            # softmax output is in [0, 1]: the int8 scale is exactly 1/127,
            # no abs-max reduction over the (large) attention tensor needed
            attn_q = jnp.round(attn * 127.0).astype(jnp.int8)
            out = int8_einsum(
                "bhsdf,bhsfe->bhsde", attn_q, jnp.float32(1.0 / 127.0), vq, sv
            ).astype(dt)
        else:
            logits = jnp.einsum(
                "bhsde,bhsfe->bhsdf", q, k, preferred_element_type=dt
            ) * (e ** -0.5)
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            out = jnp.einsum(
                "bhsdf,bhsfe->bhsde",
                attn.astype(dt),
                v,
                preferred_element_type=jnp.float32,
            ).astype(dt)

        if self.quant:
            wo_q, so = wo
            wo3q = wo_q[0, 0, 0].reshape(hd, e, C)
            amax_out = (
                observe_or_read_amax(self, out, "amax_out") if self.quant_static else None
            )
            if amax_out is None:
                oq, sout = quantize_activation_dynamic(out)
            else:
                oq, sout = quantize_activation_static(out, amax_out)
            y = (int8_einsum("bhsde,hec->bdsc", oq, sout, wo3q, so)
                 + bo.astype(jnp.float32)).astype(dt)
        else:
            wo3 = wo[0, 0, 0].astype(dt).reshape(hd, e, C)
            y = jnp.einsum("bhsde,hec->bdsc", out, wo3) + bo.astype(dt)
        return y.reshape(B, D, H, W, C) + residual


class Downsample3D(nn.Module):
    """Spatial 2x down, plain conv (unet3d.py:197-210)."""

    features: int
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Conv3D(
            self.features, (3, 4, 4), (1, 2, 2), (1, 1, 1), dtype=self.dtype,
            quant=self.quant, quant_static=self.quant_static, name="conv"
        )(x)


class Upsample3D(nn.Module):
    """Spatial 2x up, plain transposed conv (unet3d.py:213-224)."""

    features: int
    dtype: Dtype = jnp.float32
    quant: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return ConvTranspose3D(
            self.features, (3, 4, 4), (1, 2, 2), (1, 1, 1), dtype=self.dtype,
            quant=self.quant, quant_static=self.quant_static, name="conv"
        )(x)


class UNet3D(nn.Module):
    """4-level conditional UNet, epsilon-prediction (unet3d.py:227-413).

    __call__(x, t, c): x noisy latent (B, D, h, w, latent_dim), t (B,)
    timesteps, c conditioning latent (same shape as x) -> epsilon prediction
    (B, D, h, w, latent_dim).
    """

    latent_dim: int = 4
    model_channels: int = 128
    num_res_blocks: int = 2
    attention_levels: Tuple[int, ...] = (1, 2)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 4
    time_embed_dim: int = 512
    use_checkpoint: bool = False
    dtype: Dtype = jnp.float32
    # w8a8 int8 inference variant: quantizes the heavy res-block and
    # down/upsample convs plus the attention qkv/out projections;
    # conv_in/conv_out and the time path stay at the compute dtype.
    # Parameter tree changes (kernel -> kernel_q + kernel_scale) — produce
    # it with quantize.quantize_unet_params.
    quant_int8: bool = False
    # static (calibrated) activation scales: every quant site reads its
    # per-tensor abs-max from the 'act_scales' variable collection instead
    # of reducing it per call; calibrate by applying with
    # mutable=['act_scales'] (layers.observe_or_read_amax).
    quant_static: bool = False
    # int8 attention matmuls (logits + attn@v) on top of quant_int8 — see
    # TemporalAttention.quant_matmuls.
    quant_matmuls: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        num_levels = len(self.channel_mult)
        Res = partial(
            nn.remat(ResBlockT) if self.use_checkpoint else ResBlockT,
            quant=self.quant_int8,
            quant_static=self.quant_static,
        )
        Attn = partial(
            nn.remat(TemporalAttention) if self.use_checkpoint else TemporalAttention,
            quant=self.quant_int8,
            quant_static=self.quant_static,
            quant_matmuls=self.quant_matmuls,
        )

        temb = TimeEmbedding(
            self.model_channels, self.time_embed_dim, dtype=self.dtype, name="time_embed"
        )(t)

        h = jnp.concatenate([x, c], axis=-1).astype(self.dtype)  # (unet3d.py:372)
        h = Conv3D(self.model_channels, 3, 1, 1, dtype=self.dtype, name="conv_in")(h)

        # ---- encoder ----
        skips = []
        for level, mult in enumerate(self.channel_mult):
            out_ch = self.model_channels * mult
            for i in range(self.num_res_blocks):
                h = Res(out_ch, dtype=self.dtype, name=f"down{level}_res{i}")(h, temb)
                if level in self.attention_levels:
                    h = Attn(self.num_heads, dtype=self.dtype, name=f"down{level}_attn{i}")(h)
            skips.append(h)
            if level < num_levels - 1:
                h = Downsample3D(
                    out_ch, dtype=self.dtype, quant=self.quant_int8,
                    quant_static=self.quant_static,
                    name=f"down{level}_ds",
                )(h)

        # ---- middle ----
        ch = self.model_channels * self.channel_mult[-1]
        h = Res(ch, dtype=self.dtype, name="mid_res1")(h, temb)
        h = Attn(self.num_heads, dtype=self.dtype, name="mid_attn")(h)
        h = Res(ch, dtype=self.dtype, name="mid_res2")(h, temb)

        # ---- decoder ----
        for level, mult in enumerate(reversed(self.channel_mult)):
            out_ch = self.model_channels * mult
            mirror = num_levels - 1 - level
            for i in range(self.num_res_blocks + 1):
                if i == 0:
                    h = jnp.concatenate([h, skips.pop()], axis=-1)  # (unet3d.py:399-401)
                h = Res(out_ch, dtype=self.dtype, name=f"up{level}_res{i}")(h, temb)
                if mirror in self.attention_levels:
                    h = Attn(self.num_heads, dtype=self.dtype, name=f"up{level}_attn{i}")(h)
            if level < num_levels - 1:
                h = Upsample3D(
                    out_ch, dtype=self.dtype, quant=self.quant_int8,
                    quant_static=self.quant_static,
                    name=f"up{level}_us",
                )(h)

        # ---- output head ----  (unet3d.py:328-332)
        h = GroupNorm(num_groups=adaptive_num_groups(h.shape[-1]), activation="silu", name="out_norm")(h)
        h = Conv3D(self.latent_dim, 3, 1, 1, dtype=self.dtype, name="conv_out")(h)
        return h
