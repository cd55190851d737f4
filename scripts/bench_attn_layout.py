"""Micro-benchmarks for the DDIM hot-loop ops on the real TPU.

1. Attention block layouts at UNet L1/L2 dims:
     v1: current  — rearrange to (B*H*W, heads, D, c), einsum, rearrange back
     v2: in-place — einsums with batch dims (b,h,w,heads), no materialized
         transpose of the big activation
2. conv3d 3x3x3 vs depth-decomposed conv2d at L0 dims.

Usage: PYTHONPATH=/root/repo python scripts/bench_attn_layout.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
from einops import rearrange

from video_to_video_diffusion_tpu.utils.platform import enable_compilation_cache


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(out.ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out.ravel()[0])
    return (time.time() - t0) / iters


def attn_v1(qkv, num_heads):
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def to_heads(a):
        return rearrange(a, "b d h w (hd c) -> (b h w) hd d c", hd=num_heads)

    head_dim = q.shape[-1] // num_heads
    scale = head_dim ** -0.5
    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    logits = jnp.einsum("nhqc,nhkc->nhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nhqk,nhkc->nhqc", attn.astype(qh.dtype), vh,
                     preferred_element_type=jnp.float32).astype(qh.dtype)
    B, D, H, W, _ = q.shape
    return rearrange(out, "(b h w) hd d c -> b d h w (hd c)", b=B, h=H, w=W)


def attn_v2(qkv, num_heads):
    B, D, H, W, C3 = qkv.shape
    C = C3 // 3
    c = C // num_heads
    qkv = qkv.reshape(B, D, H, W, 3, num_heads, c)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    scale = c ** -0.5
    logits = jnp.einsum("bqhwnc,bkhwnc->bhwnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhwnqk,bkhwnc->bqhwnc", attn.astype(q.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(B, D, H, W, C)


def conv3d_ref(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_decomp(x, kernel):
    """3x3x3 conv as one 3x3 conv2d on depth-shifted channel stacks."""
    B, D, H, W, Cin = x.shape
    kD, kH, kW, _, Cout = kernel.shape
    zero = jnp.zeros_like(x[:, :1])
    xm = jnp.concatenate([zero, x[:, :-1]], axis=1)   # x[d-1]
    xp = jnp.concatenate([x[:, 1:], zero], axis=1)    # x[d+1]
    xc = jnp.concatenate([xm, x, xp], axis=-1)        # (B,D,H,W,3Cin)
    k2 = jnp.concatenate([kernel[0], kernel[1], kernel[2]], axis=-2)
    out = jax.lax.conv_general_dilated(
        xc.reshape(B * D, H, W, 3 * Cin), k2, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(B, D, H, W, Cout)


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    for tag, (B, D, H, W, C) in {
        "L1 (25,48,24,24,256)": (25, 48, 24, 24, 256),
        "L2 (25,48,12,12,512)": (25, 48, 12, 12, 512),
    }.items():
        qkv = jax.random.normal(key, (B, D, H, W, 3 * C), dt)
        f1 = jax.jit(partial(attn_v1, num_heads=8))
        f2 = jax.jit(partial(attn_v2, num_heads=8))
        t1 = timeit(f1, qkv)
        t2 = timeit(f2, qkv)
        ok = jnp.allclose(f1(qkv).astype(jnp.float32),
                          f2(qkv).astype(jnp.float32), atol=2e-2)
        print(f"attn {tag}: v1={t1*1e3:6.2f} ms  v2={t2*1e3:6.2f} ms  match={bool(ok)}",
              flush=True)

    for tag, (B, D, H, W, Cin, Cout) in {
        "L0 conv (25,48,48,48,128->128)": (25, 48, 48, 48, 128, 128),
        "L1 conv (25,48,24,24,256->256)": (25, 48, 24, 24, 256, 256),
    }.items():
        x = jax.random.normal(key, (B, D, H, W, Cin), dt)
        kern = jax.random.normal(key, (3, 3, 3, Cin, Cout), dt) * 0.02
        f1 = jax.jit(conv3d_ref)
        f2 = jax.jit(conv3d_decomp)
        t1 = timeit(f1, x, kern, iters=10)
        t2 = timeit(f2, x, kern, iters=10)
        ok = jnp.allclose(f1(x, kern).astype(jnp.float32),
                          f2(x, kern).astype(jnp.float32), atol=5e-1, rtol=1e-1)
        print(f"{tag}: conv3d={t1*1e3:6.2f} ms  decomp2d={t2*1e3:6.2f} ms  match={bool(ok)}",
              flush=True)


if __name__ == "__main__":
    main()
