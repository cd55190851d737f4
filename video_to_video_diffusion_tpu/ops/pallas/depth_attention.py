"""Fused depth-axis attention Pallas kernel.

The system's only attention runs along the slice/depth axis with H,W folded
into batch (reference models/unet3d.py:163-194): sequence length T <= 48,
head_dim 32-64, but batch N = B*H*W is large (thousands). The XLA lowering
materializes the (N, heads, T, T) logits tensor in HBM between the two
matmuls; this kernel keeps QK^T -> softmax -> AV entirely in VMEM per
(batch-tile, head), eliminating that round trip.

Falls back (returns None) when shapes don't tile; correctness vs the jnp
reference is tested in interpret mode (tests/test_pallas.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

TILE_N = 16


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    # blocks: (TILE_N, 1, T, hd)
    scale = q_ref.shape[-1] ** -0.5

    def body(i, _):
        q = q_ref[i, 0].astype(jnp.float32)  # (T, hd)
        k = k_ref[i, 0].astype(jnp.float32)
        v = v_ref[i, 0].astype(jnp.float32)
        logits = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )  # (T, T)
        attn = jax.nn.softmax(logits, axis=-1)
        out = lax.dot_general(
            attn, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[i, 0, :, :] = out.astype(o_ref.dtype)
        return 0

    lax.fori_loop(0, q_ref.shape[0], body, 0)


def depth_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """(N, heads, T, hd) fused attention. None -> caller falls back to jnp."""
    if not interpret and (not _HAVE_PLTPU or jax.default_backend() == "cpu"):
        return None
    N, H, T, hd = q.shape
    if N % TILE_N or T % 8 or hd % 8:
        return None
    grid = (N // TILE_N, H)
    spec = pl.BlockSpec((TILE_N, 1, T, hd), lambda n, h: (n, h, 0, 0))
    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)
