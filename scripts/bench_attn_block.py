"""Full attention-BLOCK formulations on the real TPU (qkv proj -> depth
attention -> out proj -> residual), at UNet L1/L2 dims.

  v1    current: 1x1x1 conv qkv, einops rearrange to (BHW, hd, D, c), SDPA,
        rearrange back, 1x1x1 proj, residual
  v3    single-einsum chain: projections emit the head layout directly
        ('bdsc,che->bhsde'), every contraction lane/sublane-aligned, output
        einsum lands back in natural (b,d,s,c)
  v3b   v3 with bf16 logits/softmax (halves the logits HBM roundtrip)

A packed variant (2 sites per MXU pass with a block-diagonal softmax mask)
was also measured and lost — relayout overhead ate the gain; see
docs/RESULTS.md.

Usage: PYTHONPATH=/root/repo python scripts/bench_attn_block.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
from einops import rearrange

from video_to_video_diffusion_tpu.utils.platform import enable_compilation_cache

HEADS = 8


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(out.ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out.ravel()[0])
    return (time.time() - t0) / iters


def block_v1(x, wqkv, wo, logits_dtype=jnp.float32):
    B, D, H, W, C = x.shape
    qkv = jnp.einsum("bdhwc,cf->bdhwf", x, wqkv)  # 1x1x1 conv == dot
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def to_heads(a):
        return rearrange(a, "b d h w (hd c) -> (b h w) hd d c", hd=HEADS)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    scale = qh.shape[-1] ** -0.5
    logits = jnp.einsum("nhqc,nhkc->nhqk", qh, kh,
                        preferred_element_type=logits_dtype) * scale
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("nhqk,nhkc->nhqc", attn.astype(qh.dtype), vh,
                     preferred_element_type=jnp.float32).astype(qh.dtype)
    out = rearrange(out, "(b h w) hd d c -> b d h w (hd c)", b=B, h=H, w=W)
    return jnp.einsum("bdhwc,cf->bdhwf", out, wo) + x


def _v3(x, wqkv, wo, logits_dtype):
    B, D, H, W, C = x.shape
    S = H * W
    e = C // HEADS
    xs = x.reshape(B, D, S, C)
    w3 = wqkv.reshape(C, 3, HEADS, e)
    # projections emit the head layout directly; XLA folds the transpose
    # into the dot epilogue instead of a separate relayout pass
    q = jnp.einsum("bdsc,che->bhsde", xs, w3[:, 0])
    k = jnp.einsum("bdsc,che->bhsde", xs, w3[:, 1])
    v = jnp.einsum("bdsc,che->bhsde", xs, w3[:, 2])
    scale = e ** -0.5
    logits = jnp.einsum("bhsde,bhsfe->bhsdf", q, k,
                        preferred_element_type=logits_dtype) * scale
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhsdf,bhsfe->bhsde", attn.astype(q.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    wo3 = wo.reshape(HEADS, e, C)
    y = jnp.einsum("bhsde,hec->bdsc", out, wo3)
    return y.reshape(B, D, H, W, C) + x


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    for tag, (B, D, H, W, C) in {
        "L1 (25,48,24,24,256)": (25, 48, 24, 24, 256),
        "L2 (25,48,12,12,512)": (25, 48, 12, 12, 512),
    }.items():
        x = jax.random.normal(key, (B, D, H, W, C), dt)
        wqkv = (jax.random.normal(key, (C, 3 * C), dt) * 0.02)
        wo = (jax.random.normal(key, (C, C), dt) * 0.02)
        f1 = jax.jit(block_v1)
        f1b = jax.jit(partial(block_v1, logits_dtype=jnp.bfloat16))
        f3b = jax.jit(partial(_v3, logits_dtype=jnp.bfloat16))
        t1 = timeit(f1, x, wqkv, wo)
        t1b = timeit(f1b, x, wqkv, wo)
        t3b = timeit(f3b, x, wqkv, wo)
        r1, r3 = f1(x, wqkv, wo), f3b(x, wqkv, wo)
        err = float(jnp.abs(r1.astype(jnp.float32) - r3.astype(jnp.float32)).max())
        print(f"{tag}: v1={t1*1e3:6.2f} ms  v1b={t1b*1e3:6.2f} ms  "
              f"v3b={t3b*1e3:6.2f} ms  max|v1-v3b|={err:.4f}", flush=True)


if __name__ == "__main__":
    main()
