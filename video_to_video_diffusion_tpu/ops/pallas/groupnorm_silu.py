"""Fused GroupNorm + SiLU Pallas kernel.

GroupNorm in naive form costs three HBM round trips over the activation
(read for stats, read for normalize, write). This kernel does it in two
sweeps that stay tile-resident in VMEM:

  pass 1 (stats):  per-batch per-channel sum / sum-of-squares, accumulated
                   across spatial tiles in a VMEM-resident (1, C) block;
  host math:       per-group mean/var from the per-channel sums (tiny), then
                   folded with scale/bias into a single per-channel affine;
  pass 2 (apply):  x * a + b -> SiLU, tile by tile.

Collapsing the group statistics into a per-channel affine keeps all kernel
reductions on the lane axis (no cross-lane group reshapes, which Mosaic
dislikes). Matches ops/norm.py::group_norm bit-for-bit in f32 (tested in
interpret mode in tests/test_pallas.py).

Opt-in: forward-only (no custom VJP), so it targets inference paths; the
default group_norm in ops/norm.py stays on training paths. Benchmark with
scripts/bench_pallas.py before wiring it anywhere hot.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import guard
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

_MAX_TILE_BYTES = 4 * 1024 * 1024


def _pick_tile(S: int, C: int) -> Optional[int]:
    """Largest divisor of S whose (tile, C) f32 block fits the VMEM budget.

    The tile is the block's second-to-last dim, so Mosaic requires it be a
    multiple of 8 (sublane) unless it equals S itself.
    """
    max_tile = max(_MAX_TILE_BYTES // (C * 4), 1)
    if S <= max_tile:
        return S
    best = None
    d = 1
    while d * d <= S:
        if S % d == 0:
            for cand in (d, S // d):
                if cand <= max_tile and cand % 8 == 0 and (best is None or cand > best):
                    best = cand
        d += 1
    return best


def _stats_kernel(x_ref, sum_ref, sq_ref):
    # sum/sq blocks are (1, 1, C) — the singleton dims legally equal the
    # array dims, satisfying Mosaic's (8, 128) block-tiling constraint.
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    x = x_ref[0].astype(jnp.float32)  # (TILE_S, C)
    sum_ref[0, 0, :] += jnp.sum(x, axis=0)
    sq_ref[0, 0, :] += jnp.sum(x * x, axis=0)


def _apply_kernel(x_ref, a_ref, b_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    y = x * a_ref[0] + b_ref[0]  # a/b blocks (1, 1, C) broadcast over rows
    o_ref[0, :, :] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def group_norm_silu_pallas(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Fused GN+SiLU over channels-last x of shape (B, ..., C).

    Returns None when the shape doesn't tile cleanly (caller falls back to
    the jnp implementation).
    """
    if not interpret and (not _HAVE_PLTPU or jax.default_backend() == "cpu"):
        return None
    import math

    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    S = math.prod(x.shape[1:-1]) if x.ndim > 2 else 1
    if C % num_groups or C % 128:
        return None
    tile = _pick_tile(S, C)
    if tile is None or S % tile:
        return None
    n_tiles = S // tile
    xr = x.reshape(B, S, C)

    kw = dict(interpret=interpret)
    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, tile, C), lambda b, s: (b, s, 0))],
        out_specs=[
            pl.BlockSpec((1, 1, C), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, s: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        **kw,
    )(xr)
    sums = sums[:, 0]
    sqs = sqs[:, 0]

    # group stats from per-channel sums (tiny, XLA)
    g = num_groups
    cg = C // g
    n = S * cg
    gsum = sums.reshape(B, g, cg).sum(-1)  # (B, g)
    gsq = sqs.reshape(B, g, cg).sum(-1)
    mean = gsum / n
    var = jnp.maximum(gsq / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)  # (B, g)
    mean_c = jnp.repeat(mean, cg, axis=1)  # (B, C)
    inv_c = jnp.repeat(inv, cg, axis=1)
    a2d = inv_c * scale.astype(jnp.float32)[None, :]
    b2d = bias.astype(jnp.float32)[None, :] - mean_c * a2d
    a = a2d[:, None, :]  # (B, 1, C) — singleton dim keeps blocks tiling-legal
    b = b2d[:, None, :]

    out = pl.pallas_call(
        _apply_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b_, s: (b_, s, 0)),
            pl.BlockSpec((1, 1, C), lambda b_, s: (b_, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b_, s: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b_, s: (b_, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        **kw,
    )(xr, a, b)
    return out.reshape(orig_shape)
