"""Trained-params -> int8 inference-params transform for the UNet.

The w8a8 UNet variant (UNet3D(quant_int8=True)) reads `kernel_q` (int8) +
`kernel_scale` (f32, per out-channel) where the trained module reads
`kernel`. This module converts a trained tree into that structure — ONCE,
outside the sampling scan, so the 50-step DDIM loop carries int8 weights
and never re-quantizes (see ops/quant.py for the scheme and measurements).

The mapping is structural, not name-guessing: the target structure comes
from `jax.eval_shape` of the quantized module's own init, so it stays
correct if the set of quantized convs changes.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict

from video_to_video_diffusion_tpu.ops.quant import quantize_kernel


def quantize_params_like(target_structure: Dict[str, Any], params: Dict[str, Any]):
    """Fill a quantized param structure from a trained f32/bf16 tree.

    Args:
      target_structure: pytree of jax.ShapeDtypeStruct (or arrays) with the
        quantized module's structure — `kernel_q`/`kernel_scale` leaves where
        convs are quantized, everything else identical to the source tree.
      params: the trained tree (plain `kernel` leaves).

    Returns a concrete tree matching `target_structure`: quantized kernels
    where asked, all other leaves copied from `params` by path.
    """
    src = flatten_dict(params)
    out = {}
    for path in flatten_dict(target_structure):
        leaf_name = path[-1]
        if leaf_name in ("kernel_q", "kernel_scale"):
            kq, scale = quantize_kernel(src[path[:-1] + ("kernel",)])
            out[path] = kq if leaf_name == "kernel_q" else scale
        else:
            out[path] = src[path]
    return unflatten_dict(out)


def unet_int8_structure(unet_int8, latent_shape, dtype=jnp.float32, cond_channels=None):
    """Abstract param structure of the quantized UNet via eval_shape.

    latent_shape: (B, D, h, w, latent_dim) of one latent input.
    cond_channels: conditioning channel count when it differs from
    latent_dim (residual mode's space-to-depth conditioning).
    """
    z = jnp.zeros(latent_shape, dtype)
    c = jnp.zeros((*latent_shape[:-1], cond_channels or latent_shape[-1]), dtype)
    t = jnp.zeros((latent_shape[0],), jnp.int32)
    shapes = jax.eval_shape(
        lambda: unet_int8.init(jax.random.PRNGKey(0), z, t, c)["params"]
    )
    return shapes


def vae_int8_structure(vae_int8, volume_shape, dtype=jnp.float32):
    """Abstract param structure of the decoder-quantized VAE via eval_shape.

    volume_shape: (B, D, H, W, C) of one input volume. The encoder subtree
    keeps plain kernels (copied by path in quantize_params_like); decoder
    convs get kernel_q/kernel_scale leaves.
    """
    x = jnp.zeros(volume_shape, dtype)
    shapes = jax.eval_shape(
        lambda: vae_int8.init(jax.random.PRNGKey(0), x)["params"]
    )
    return shapes


def unet_act_scales_zeros(unet_static, latent_shape, dtype=jnp.float32, cond_channels=None):
    """Concrete zeroed 'act_scales' collection for the static-quant UNet.

    Structure comes from eval_shape of the module's own init (like
    unet_int8_structure), so it tracks the set of quant sites automatically.
    Fill by running calibration forwards with mutable=['act_scales'].
    """
    z = jnp.zeros(latent_shape, dtype)
    c = jnp.zeros((*latent_shape[:-1], cond_channels or latent_shape[-1]), dtype)
    t = jnp.zeros((latent_shape[0],), jnp.int32)
    shapes = jax.eval_shape(
        lambda: unet_static.init(jax.random.PRNGKey(0), z, t, c)["act_scales"]
    )
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
