"""Pallas-vs-XLA microbenchmarks on the TPU (GroupNorm+SiLU, depth attention).

Run on a free chip; prints per-op timings so the dispatch decision
(ops.pallas.enable_pallas) is grounded in measurement.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_to_video_diffusion_tpu.utils.platform import enable_compilation_cache


CHAIN = 50  # iterations chained device-side per measurement


def chained(op):
    """Run `op` CHAIN times with a device-side dependency chain inside one
    jit — a single host round-trip per measurement (the relay RTT is ~36 ms,
    which would otherwise swamp sub-ms kernels)."""

    @jax.jit
    def many(x):
        return jax.lax.fori_loop(0, CHAIN, lambda i, a: op(a), x)

    return many


def timed(name, fn, *args, n=3):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])  # compile + sync
    t0 = time.time()
    for _i in range(n):
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.time() - t0) / n / CHAIN
    print(f"{name}: {dt * 1e3:.3f} ms/op", flush=True)
    return dt


def main():
    enable_compilation_cache()
    from video_to_video_diffusion_tpu.ops.norm import group_norm
    from video_to_video_diffusion_tpu.ops.pallas.groupnorm_silu import (
        group_norm_silu_pallas,
    )
    from video_to_video_diffusion_tpu.ops.attention import depth_attention_reference
    from video_to_video_diffusion_tpu.ops.pallas.depth_attention import (
        depth_attention_pallas,
    )

    rng = np.random.default_rng(0)
    results = {}

    for name, shape, groups in (
        ("gn_unet_lvl0", (5, 48, 48, 48, 128), 32),
        ("gn_vae_fullres", (1, 48, 192, 192, 128), 8),
    ):
        x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32)).astype(jnp.bfloat16)
        scale = jnp.ones(shape[-1])
        bias = jnp.zeros(shape[-1])
        jx = chained(lambda x: group_norm(x, scale, bias, groups, activation="silu"))
        px = chained(lambda x: group_norm_silu_pallas(x, scale, bias, groups))
        t_x = timed(f"{name} xla", jx, x)
        try:
            t_p = timed(f"{name} pallas", px, x)
            results[name] = (t_x, t_p)
        except Exception as e:  # noqa: BLE001
            print(f"{name} pallas FAILED: {type(e).__name__}: {e}", flush=True)

    for name, shape in (
        ("attn_lvl1", (5 * 24 * 24, 8, 48, 32)),
        ("attn_lvl2", (5 * 12 * 12, 8, 48, 64)),
    ):
        q = jnp.asarray(rng.standard_normal(shape, dtype=np.float32)).astype(jnp.bfloat16)
        jx = chained(lambda q: depth_attention_reference(q, q, q))
        px = chained(lambda q: depth_attention_pallas(q, q, q))
        t_x = timed(f"{name} xla", jx, q)
        try:
            t_p = timed(f"{name} pallas", px, q)
            results[name] = (t_x, t_p)
        except Exception as e:  # noqa: BLE001
            print(f"{name} pallas FAILED: {type(e).__name__}: {e}", flush=True)

    for k, (tx, tp) in results.items():
        print(f"SUMMARY {k}: xla={tx*1e3:.2f}ms pallas={tp*1e3:.2f}ms speedup={tx/tp:.2f}x")


if __name__ == "__main__":
    main()
