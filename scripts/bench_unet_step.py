"""Time UNet forward variants on the real TPU to locate headroom in the
DDIM hot loop (93% of the headline benchmark).

Variants:
  base      - production UNet (128ch, [1,2,4,4], attn levels (1,2))
  no_attn   - attention levels () -> isolates attention cost
  no_g32    - (placeholder for norm experiments)

Usage: python scripts/bench_unet_step.py [--batch 25] [--iters 10]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.utils.platform import enable_compilation_cache
from video_to_video_diffusion_tpu.models.unet3d import UNet3D
from video_to_video_diffusion_tpu.ops.precision import Policy


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(out.ravel()[0])  # force host readback through the relay
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out.ravel()[0])
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=25)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default="base,no_attn")
    args = ap.parse_args()

    enable_compilation_cache()
    policy = Policy.from_precision("bf16")
    key = jax.random.PRNGKey(0)
    B, D, Hh, W, C = args.batch, 48, 48, 48, 8
    z = jax.random.normal(key, (B, D, Hh, W, C), jnp.float32)
    c = jax.random.normal(key, (B, D, Hh, W, C), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)

    def build(attn_levels):
        net = UNet3D(
            latent_dim=C,
            model_channels=128,
            num_res_blocks=2,
            attention_levels=attn_levels,
            channel_mult=(1, 2, 4, 4),
            num_heads=8,
            time_embed_dim=1024,
            dtype=policy.compute_dtype,
        )
        params = jax.eval_shape(
            lambda k: net.init(k, z[:1], t[:1], c[:1]), jax.random.PRNGKey(1)
        )
        params = jax.tree.map(
            lambda s: jax.random.normal(key, s.shape, s.dtype) * 0.02, params
        )
        fwd = jax.jit(lambda p, z, t, c: net.apply(p, z, t, c))
        return fwd, params

    for name in args.variants.split(","):
        levels = {"base": (1, 2), "no_attn": ()}[name]
        fwd, params = build(levels)
        dt = timeit(fwd, params, z, t, c, iters=args.iters)
        print(f"{name:10s} batch={B}: {dt*1e3:8.1f} ms/fwd  "
              f"({dt/B*1e3:6.1f} ms/patch)", flush=True)


if __name__ == "__main__":
    main()
