"""Decompose the int8_static sampling stage on the real TPU.

The headline bench (40.6 s int8_static) spends ~36 s in the 50-step DDIM
scan. This script splits one UNet evaluation into its cost components to
locate what stands between the measured time and the int8-conv ideal
(bf16 conv floor / 2 + attention):

  bf16          trained-precision UNet forward (reference point, ~1010 ms)
  int8          w8a8 with dynamic per-call activation abs-max reductions
  int8_static   w8a8 with calibrated scales (the shipped fast path)
  int8_no_attn  int8_static with attention levels () -> conv-only cost
  sampler_only  the DDIM scan body without the UNet (pure update math)

Usage: python scripts/bench_int8_decomp.py [--batch 25] [--iters 10]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.utils.platform import enable_compilation_cache
from video_to_video_diffusion_tpu.models.unet3d import UNet3D
from video_to_video_diffusion_tpu.inference.sampler import ddim_sample
from video_to_video_diffusion_tpu.models.diffusion import make_schedule
from video_to_video_diffusion_tpu.ops.precision import Policy


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])  # force host readback via relay
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.time() - t0) / iters


def build(attn_levels, policy, z, t, c, quant_int8=False, quant_static=False):
    net = UNet3D(
        latent_dim=z.shape[-1],
        model_channels=128,
        num_res_blocks=2,
        attention_levels=attn_levels,
        channel_mult=(1, 2, 4, 4),
        num_heads=8,
        time_embed_dim=1024,
        dtype=policy.compute_dtype,
        quant_int8=quant_int8,
        quant_static=quant_static,
    )
    key = jax.random.PRNGKey(0)
    tree = jax.eval_shape(
        lambda k: net.init(k, z[:1], t[:1], c[:1]), jax.random.PRNGKey(1)
    )

    def mat(s):
        if s.dtype == jnp.int8:
            return jax.random.randint(key, s.shape, -127, 128, jnp.int32).astype(jnp.int8)
        return (jax.random.normal(key, s.shape, jnp.float32) * 0.02 + 0.01).astype(s.dtype)

    tree = jax.tree.map(mat, tree)
    fwd = jax.jit(lambda v, z, t, c: net.apply(v, z, t, c))
    return fwd, tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=25)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--variants", default="bf16,int8,int8_static,int8_no_attn,sampler_only"
    )
    args = ap.parse_args()

    enable_compilation_cache()
    policy = Policy.from_precision("bf16")
    key = jax.random.PRNGKey(0)
    B, D, Hh, W, C = args.batch, 48, 48, 48, 8
    z = jax.random.normal(key, (B, D, Hh, W, C), jnp.float32)
    c = jax.random.normal(key, (B, D, Hh, W, C), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)

    specs = {
        "bf16": dict(attn=(1, 2)),
        "int8": dict(attn=(1, 2), quant_int8=True),
        "int8_static": dict(attn=(1, 2), quant_int8=True, quant_static=True),
        "int8_no_attn": dict(attn=(), quant_int8=True, quant_static=True),
    }

    for name in args.variants.split(","):
        if name == "sampler_only":
            schedule = make_schedule("cosine", 1000)
            scan = jax.jit(
                lambda k: ddim_sample(
                    lambda zz, tt: zz, schedule, k, z.shape, 50
                )
            )
            dt = timeit(scan, jax.random.PRNGKey(2), iters=max(args.iters // 2, 3))
            print(
                f"{name:13s} batch={B}: {dt*1e3:8.1f} ms / 50-step scan "
                f"({dt/50*1e3:6.2f} ms/step of pure update math)",
                flush=True,
            )
            continue
        s = specs[name]
        fwd, tree = build(
            s["attn"], policy, z, t, c,
            quant_int8=s.get("quant_int8", False),
            quant_static=s.get("quant_static", False),
        )
        dt = timeit(fwd, tree, z, t, c, iters=args.iters)
        print(
            f"{name:13s} batch={B}: {dt*1e3:8.1f} ms/fwd ({dt/B*1e3:6.1f} ms/patch)",
            flush=True,
        )


if __name__ == "__main__":
    main()
