"""int8 quantized conv primitives for the v5e MXU.

The v5e MXU does 394 TOP/s int8 vs 197 TFLOP/s bf16, and the UNet's convs
already run at ~61% bf16 MFU (compute-bound), so w8a8 quantization is a
near-2x lever on the DDIM hot loop (measured: scripts/bench_int8_conv.py —
int8 1.57x at UNet L0, 1.96x at the decoder concat shape, including the
dynamic-quantization passes 1.33x/1.58x).

Scheme (inference-only):
  weights     per-output-channel symmetric int8: q = round(w / s_o),
              s_o = max|w[..., o]| / 127 — computed ONCE per generate call
              by `quantize_kernel` (outside the sampling scan, so the scan
              carries int8 weights and never re-quantizes).
  activations per-tensor dynamic symmetric int8: s_x = max|x| / 127,
              computed per conv input. Costs ~2 extra HBM passes (XLA fuses
              the abs-max with surrounding elementwise work where it can).
  accumulate  int32 on the MXU, rescaled to the compute dtype as
              y = conv_int32 * (s_x * s_o) + bias. Bias stays unquantized.

The reference has no quantized path (pure fp torch, SURVEY §0); this is a
TPU-native capability addition, opt-in via `quant='int8'` on the inference
pipeline. Quality impact is measured per-checkpoint (docs/RESULTS.md).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.ops.conv import conv3d, conv3d_transpose, IntOr3

_EPS = 1e-12


def quantize_kernel(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of a DHWIO kernel.

    Returns (kernel_q int8 (kD,kH,kW,Cin,Cout), scale f32 (Cout,)).
    """
    k = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=(0, 1, 2, 3))
    scale = jnp.maximum(amax, _EPS) / 127.0
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return kq, scale


def quantize_activation_dynamic(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor dynamic symmetric int8 quantization.

    Returns (x_q int8, s_x f32 scalar).
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), _EPS) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def quantize_activation_static(
    x: jnp.ndarray, amax: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor static symmetric int8 quantization with a calibrated abs-max.

    Unlike the dynamic variant there is no reduction over `x`: the
    round/clip is pure elementwise work XLA fuses into the producing op,
    which removes the extra HBM read the dynamic abs-max pass costs per
    quantized conv. Values beyond the calibrated `amax` saturate at +-127
    (standard symmetric-quant clipping).

    Returns (x_q int8, s_x f32 scalar).
    """
    sx = jnp.maximum(amax.astype(jnp.float32), _EPS) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def int8_conv3d(
    x: jnp.ndarray,
    kernel_q: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
    out_dtype=jnp.bfloat16,
    x_amax: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """w8a8 conv3d: act quant -> int8 MXU conv -> int32 -> rescale.

    Activation quantization is dynamic (per-call abs-max reduction) unless a
    calibrated `x_amax` is given, in which case the scale is static and the
    quantize step fuses into the producer (quantize_activation_static).
    """
    if x_amax is None:
        xq, sx = quantize_activation_dynamic(x)
    else:
        xq, sx = quantize_activation_static(x, x_amax)
    y = conv3d(xq, kernel_q, None, stride=stride, padding=padding,
               preferred_dtype=jnp.int32)
    out = y.astype(jnp.float32) * (sx * kernel_scale.astype(jnp.float32))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def int8_einsum(
    eq: str,
    x_q: jnp.ndarray,
    x_scale: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
) -> jnp.ndarray:
    """int8 x int8 einsum -> int32 on the MXU -> f32 rescale.

    `w_scale` must broadcast against the einsum output (put the per-output-
    channel axis where the output has it). Returns f32; caller adds bias and
    casts. Used for the attention qkv/out projections, which are plain dots
    once the 1x1x1 conv kernels are reshaped (models/unet3d.py docstring).
    """
    y = jnp.einsum(eq, x_q, w_q, preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (x_scale * w_scale)


def int8_conv3d_transpose(
    x: jnp.ndarray,
    kernel_q: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
    output_padding: IntOr3 = 0,
    out_dtype=jnp.bfloat16,
    x_amax: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """w8a8 transposed conv3d (same scheme as int8_conv3d)."""
    if x_amax is None:
        xq, sx = quantize_activation_dynamic(x)
    else:
        xq, sx = quantize_activation_static(x, x_amax)
    y = conv3d_transpose(xq, kernel_q, None, stride=stride, padding=padding,
                         output_padding=output_padding,
                         preferred_dtype=jnp.int32)
    out = y.astype(jnp.float32) * (sx * kernel_scale.astype(jnp.float32))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
