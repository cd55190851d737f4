"""Mesh-sharded full-volume stitching.

Every sliding-window patch is an independent DDIM sample (the reference's
triple loop at inference/sampler.py:403-445 is a pure map), so the patch
batch is the natural data-parallel axis: shard it over the mesh 'data' axis
and XLA splits the whole encode -> DDIM scan -> decode pipeline across chips
with zero communication; only the Gaussian-blend accumulation (cheap,
bandwidth-bound) sees the gathered patches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.inference.sampler import sample_with_stitching
from video_to_video_diffusion_tpu.parallel.mesh import DATA_AXIS
from video_to_video_diffusion_tpu.parallel.sharding import batch_sharding, replicate


_GEN_CACHE = {}


def sharded_patch_generator(model, params, mesh, num_inference_steps: int, depth_ratio: int):
    """A generate-batch fn whose patch axis is sharded over 'data'.

    Returns fn(params, patches, key)-backed wrapper bound to `params`;
    the jitted core is cached per (model, mesh, steps, ratio) so repeated
    stitching calls never recompile. N must be a multiple of the data-axis
    size.
    """
    in_shard = batch_sharding(mesh)
    rep = replicate(mesh)
    ck = (id(model), id(mesh), num_inference_steps, depth_ratio)
    if ck not in _GEN_CACHE:

        @jax.jit
        def gen(p, v, k):
            v = jax.lax.with_sharding_constraint(v, in_shard)
            return model.generate(
                p, v, k, "ddim", num_inference_steps,
                target_depth=v.shape[1] * depth_ratio,
            )

        _GEN_CACHE[ck] = gen
    gen = _GEN_CACHE[ck]

    def wrapped(v, k):
        v = jax.device_put(v, in_shard)
        k = jax.device_put(k, rep)
        return gen(params, v, k)

    return wrapped


def sample_with_stitching_sharded(
    model,
    params,
    mesh,
    v_thick_full: jnp.ndarray,
    key: jax.Array,
    num_inference_steps: int = 20,
    patch_size: Tuple[int, int, int] = (8, 192, 192),
    target_patch_size: Tuple[int, int, int] = (48, 192, 192),
    stride: Tuple[int, int, int] = (4, 96, 96),
    patch_batch: Optional[int] = None,
) -> jnp.ndarray:
    """Full-volume stitching with the patch grid fanned out over the mesh."""
    n_data = mesh.shape[DATA_AXIS]
    if patch_batch is None:
        patch_batch = max(n_data, 8 // max(n_data, 1) * n_data)
    patch_batch = max((patch_batch // n_data) * n_data, n_data)
    ratio = target_patch_size[0] // patch_size[0]
    gen = sharded_patch_generator(model, params, mesh, num_inference_steps, ratio)
    return sample_with_stitching(
        gen,
        v_thick_full,
        key,
        patch_size=patch_size,
        target_patch_size=target_patch_size,
        stride=stride,
        patch_batch=patch_batch,
    )
