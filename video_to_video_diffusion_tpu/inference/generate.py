"""Generation convenience wrappers (reference inference/generate.py:14-226).

`generate_video` (file -> transform -> generate -> save), `generate_batch`,
and `interpolate_videos` (latent-space lerp between two inputs, reference
:158-226) over the composite model.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_to_video_diffusion_tpu.data.transforms import (
    DenormalizeVideo,
    VideoTransform,
    load_video,
    save_video,
)
from video_to_video_diffusion_tpu.models.diffusion import to_epsilon
from video_to_video_diffusion_tpu.inference.sampler import ddim_sample
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
from video_to_video_diffusion_tpu.utils.metrics import calculate_video_metrics

_GEN_CACHE = {}


def _jitted_generate(model, sampler, steps, target_depth):
    """One jitted generate per (model, sampler, steps, depth) — eager
    generate would dispatch each op separately on remote TPU backends."""
    key = (id(model), sampler, steps, target_depth)
    if key not in _GEN_CACHE:
        _GEN_CACHE[key] = jax.jit(
            lambda p, v, k: model.generate(p, v, k, sampler, steps, target_depth)
        )
    return _GEN_CACHE[key]


def generate_video(
    model: VideoToVideoDiffusion,
    params,
    input_path: str,
    output_path: Optional[str] = None,
    key: Optional[jax.Array] = None,
    sampler: str = "ddim",
    num_inference_steps: int = 20,
    target_depth: Optional[int] = None,
    size=(256, 256),
) -> np.ndarray:
    """Load a video/volume file, run generation, optionally save the output."""
    key = key if key is not None else jax.random.PRNGKey(0)
    frames = load_video(input_path)
    v_in = VideoTransform(size)(frames)[None]  # (1, D, h, w, C)
    out = _jitted_generate(model, sampler, num_inference_steps, target_depth)(
        params, jnp.asarray(v_in), key
    )
    out_np = np.asarray(out)
    if output_path:
        save_video(out_np, output_path)
    return out_np


def generate_batch(
    model: VideoToVideoDiffusion,
    params,
    inputs: np.ndarray,
    key: Optional[jax.Array] = None,
    sampler: str = "ddim",
    num_inference_steps: int = 20,
    target_depth: Optional[int] = None,
    targets: Optional[np.ndarray] = None,
) -> Dict:
    """Batched generation (+ metrics vs optional targets). Reference :98-155."""
    key = key if key is not None else jax.random.PRNGKey(0)
    out = np.asarray(
        _jitted_generate(model, sampler, num_inference_steps, target_depth)(
            params, jnp.asarray(inputs), key
        )
    )
    result = {"videos": out}
    if targets is not None:
        denorm = DenormalizeVideo()
        result["metrics"] = calculate_video_metrics(denorm(out), denorm(targets))
    return result


def interpolate_videos(
    model: VideoToVideoDiffusion,
    params,
    v_a: np.ndarray,
    v_b: np.ndarray,
    num_interpolations: int = 5,
    key: Optional[jax.Array] = None,
    num_inference_steps: int = 20,
) -> List[np.ndarray]:
    """Latent lerp between two conditioning volumes (reference :158-226):
    encode both, interpolate the conditioning latent, sample each blend with
    a shared noise key, decode."""
    key = key if key is not None else jax.random.PRNGKey(0)

    # all stages jitted once and reused across blend factors (eager model
    # code is pathological on remote-compile TPU backends)
    ck = (id(model), "interp", num_inference_steps)
    if ck not in _GEN_CACHE:
        enc = jax.jit(lambda p, v: model.encode(p, v, f32=True))
        dec = jax.jit(lambda p, z: model.decode(p, z, f32=True))

        def _sample(p, z_c, k):
            def eps_fn(z, t):
                out = model.apply_unet(p, z, t, z_c, f32=True)
                return to_epsilon(model.schedule, model.prediction_type, z, t, out)

            return ddim_sample(eps_fn, model.schedule, k, z_c.shape, num_inference_steps)

        _GEN_CACHE[ck] = (enc, jax.jit(_sample), dec)
    enc, sample, dec = _GEN_CACHE[ck]

    z_a = enc(params, jnp.asarray(v_a))
    z_b = enc(params, jnp.asarray(v_b))
    outs = []
    for i in range(num_interpolations):
        alpha = i / max(num_interpolations - 1, 1)
        z_c = (1.0 - alpha) * z_a + alpha * z_b
        z0 = sample(params, z_c, key)
        outs.append(np.asarray(dec(params, z0)))
    return outs
