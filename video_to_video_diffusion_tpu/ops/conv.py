"""3D convolution primitives in NDHWC layout.

Shape semantics match ``torch.nn.Conv3d`` / ``ConvTranspose3d`` for the
configurations the reference uses (k=3 s=1 p=1; k=(3,4,4) s=(1,2,2)
p=(1,1,1) and its transpose — reference models/vae.py:59-97,
models/unet3d.py:197-224), verified numerically against torch in
tests/test_ops.py. Kernels are stored DHWIO so the channel contraction is the
trailing (lane) axis — the MXU-friendly layout XLA wants.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr3 = Union[int, Sequence[int]]

_DIMNUMS = ("NDHWC", "DHWIO", "NDHWC")


def _triple(v: IntOr3) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    assert len(t) == 3, f"expected 3 entries, got {t}"
    return t


def conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
    preferred_dtype=None,
) -> jnp.ndarray:
    """Correlation conv (torch Conv3d semantics).

    Args:
      x: (B, D, H, W, Cin)
      kernel: (kD, kH, kW, Cin, Cout)
      bias: (Cout,) or None
      stride / padding: int or per-axis (d, h, w); symmetric zero padding.
    """
    stride = _triple(stride)
    padding = _triple(padding)
    pads = [(p, p) for p in padding]
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=pads,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv3d_transpose(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: IntOr3 = 1,
    padding: IntOr3 = 0,
    output_padding: IntOr3 = 0,
    preferred_dtype=None,
) -> jnp.ndarray:
    """Transposed conv (torch ConvTranspose3d shape semantics).

    out_size = (in - 1) * stride - 2 * padding + k + output_padding

    Implemented as the fractionally-strided correlation: dilate the input by
    ``stride`` (lhs_dilation), pad each spatial axis with (k-1-p,
    k-1-p+output_padding), and correlate with the spatially flipped kernel.
    The flip makes this the exact adjoint of `conv3d` — to port torch
    ConvTranspose3d weights (in, out, kD, kH, kW) use
    ``kernel = np.transpose(w, (2, 3, 4, 0, 1))`` with NO flip (tested in
    tests/test_ops.py).

    Args:
      x: (B, D, H, W, Cin)
      kernel: (kD, kH, kW, Cin, Cout)
    """
    stride = _triple(stride)
    padding = _triple(padding)
    output_padding = _triple(output_padding)
    ks = kernel.shape[:3]
    pads = [
        (k - 1 - p, k - 1 - p + op)
        for k, p, op in zip(ks, padding, output_padding)
    ]
    kernel_flipped = jnp.flip(kernel, axis=(0, 1, 2))
    out = lax.conv_general_dilated(
        x,
        kernel_flipped,
        window_strides=(1, 1, 1),
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
