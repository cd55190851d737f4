"""Does int8 win on the v5e MXU for this model's conv shapes?

v5e peak: 197 TFLOP/s bf16, 394 TOP/s int8. The UNet's convs run at ~66%
bf16 MFU (compute-bound), so an int8 path could approach 2x — IF XLA lowers
int8 conv3d to the MXU's int8 mode through this backend. This script
measures exactly that before any engineering is committed:

  bf16   - production conv (3x3x3, NDHWC)
  int8   - same conv, int8 in / int32 accumulate / rescale to bf16
  int8dq - int8 including dynamic activation quantization (max-abs pass)

Shapes: UNet L0 (48^3 x 128), decoder-heavy L1 concat (256->128 at 48^3),
and a VAE decoder conv (192^2 full-res).

Usage: python scripts/bench_int8_conv.py [--iters 20]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.utils.platform import enable_compilation_cache

DN = ("NDHWC", "DHWIO", "NDHWC")


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.asarray(out, jnp.float32).ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out, jnp.float32).ravel()[0])
    return (time.time() - t0) / iters


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=DN
    )


def conv_int8(xq, wq, scale):
    y = jax.lax.conv_general_dilated(
        xq, wq, (1, 1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * scale).astype(jnp.bfloat16)


def conv_int8_dq(x, wq, w_scale):
    a = jnp.max(jnp.abs(x.astype(jnp.float32)))
    sx = a / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, (1, 1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (sx * w_scale)).astype(jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)

    shapes = {
        "L0 25x(48,48,48)x128->128": ((25, 48, 48, 48, 128), (3, 3, 3, 128, 128)),
        "dec 25x(48,48,48)x256->128": ((25, 48, 48, 48, 256), (3, 3, 3, 256, 128)),
        "vaedec 5x(48,192,192)x128->128": ((5, 48, 192, 192, 128), (3, 3, 3, 128, 128)),
    }
    for tag, (xs, ws) in shapes.items():
        x = jax.random.normal(key, xs, jnp.bfloat16)
        w = jax.random.normal(key, ws, jnp.bfloat16) * 0.05
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 256), -127, 127).astype(jnp.int8)
        f_bf = jax.jit(conv_bf16)
        f_i8 = jax.jit(conv_int8)
        f_dq = jax.jit(conv_int8_dq)
        t_bf = timeit(f_bf, x, w, iters=args.iters)
        t_i8 = timeit(f_i8, xq, wq, jnp.float32(1 / (16 * 256)), iters=args.iters)
        t_dq = timeit(f_dq, x, wq, jnp.float32(1 / 256), iters=args.iters)
        flops = 2 * xs[0] * xs[1] * xs[2] * xs[3] * ws[3] * ws[4] * 27
        print(
            f"{tag}: bf16={t_bf*1e3:7.2f} ms ({flops/t_bf/1e12:5.1f} TF/s)  "
            f"int8={t_i8*1e3:7.2f} ms ({flops/t_i8/1e12:5.1f} TOP/s)  "
            f"int8+dq={t_dq*1e3:7.2f} ms  speedup(i8)={t_bf/t_i8:4.2f}x "
            f"(dq)={t_bf/t_dq:4.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
