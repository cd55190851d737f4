"""Mesh-sharded full-volume stitching.

Every sliding-window patch is an independent DDIM sample (the reference's
triple loop at inference/sampler.py:403-445 is a pure map), so the patch
batch is the natural data-parallel axis: shard it over the mesh 'data' axis
and XLA splits the whole encode -> DDIM scan -> decode pipeline across chips
with zero communication; only the Gaussian-blend accumulation (cheap,
bandwidth-bound) sees the gathered patches.

The per-patch-batch generator runs through inference.pipeline.staged_generate
— the SAME independently compiled encode/sample/decode stage jits as the
single-chip path (shared _STAGE_CACHE; jax re-lowers each stage per input
sharding automatically) — never a monolithic jit of model.generate, whose
fused program takes >20 min to compile through a remote compiler
(inference/pipeline.py docstring). This also gives the mesh path the w8a8
int8 scan (`quant='int8'`) and int8 decode (`quant_vae='int8'`) for free.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.inference.pipeline import staged_generate
from video_to_video_diffusion_tpu.inference.sampler import sample_with_stitching
from video_to_video_diffusion_tpu.parallel.mesh import DATA_AXIS
from video_to_video_diffusion_tpu.parallel.sharding import batch_sharding, replicate


def sharded_patch_generator(
    model,
    params,
    mesh,
    num_inference_steps: int,
    depth_ratio: int,
    quant: Optional[str] = None,
    quant_vae: Optional[str] = None,
    sampler: str = "ddim",
    eta: float = 0.0,
    init_scale: float = 1.0,
):
    """A generate-batch fn whose patch axis is sharded over 'data'.

    Returns fn(patches, key) bound to `params`: inputs are device_put with
    the batch sharded over the mesh 'data' axis (key replicated), then run
    through the cached staged_generate stage jits. N must be a multiple of
    the data-axis size.
    """
    in_shard = batch_sharding(mesh)
    rep = replicate(mesh)

    def wrapped(v, k):
        v = jax.device_put(v, in_shard)
        k = jax.device_put(k, rep)
        return staged_generate(
            model,
            params,
            v,
            k,
            num_inference_steps=num_inference_steps,
            target_depth=v.shape[1] * depth_ratio,
            eta=eta,
            sampler=sampler,
            quant=quant,
            quant_vae=quant_vae,
            init_scale=init_scale,
        )

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
    quant: Optional[str] = None,
    quant_vae: Optional[str] = None,
    sampler: str = "ddim",
    eta: float = 0.0,
    init_scale: float = 1.0,
) -> jnp.ndarray:
    """Full-volume stitching with the patch grid fanned out over the mesh."""
    n_data = mesh.shape[DATA_AXIS]
    if patch_batch is None:
        patch_batch = max(n_data, 8 // max(n_data, 1) * n_data)
    patch_batch = max((patch_batch // n_data) * n_data, n_data)
    ratio = target_patch_size[0] // patch_size[0]
    gen = sharded_patch_generator(
        model, params, mesh, num_inference_steps, ratio, quant=quant,
        quant_vae=quant_vae, sampler=sampler, eta=eta, init_scale=init_scale,
    )
    return sample_with_stitching(
        gen,
        v_thick_full,
        key,
        patch_size=patch_size,
        target_patch_size=target_patch_size,
        stride=stride,
        patch_batch=patch_batch,
    )
