"""Empirical VAE latent scaling-factor calculator.

Rebuild of scripts/calculate_vae_scaling_factor.py: run N training batches
through the encoder with scaling disabled, compute scale = 1 / std(latents),
and compare against Stable Diffusion's 0.18215 (reference :88-165).

Usage:
  python scripts/calculate_vae_scaling_factor.py --config vae_training \
      --checkpoint <vae ckpt dir> [--num-batches 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_to_video_diffusion_tpu.config import load_config
from video_to_video_diffusion_tpu.data.loader import get_unified_dataloader
from video_to_video_diffusion_tpu.models.vae import SliceInterpolationVAE
from video_to_video_diffusion_tpu.utils.checkpoint import load_checkpoint

SD_SCALE = 0.18215


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="vae_training")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--num-batches", type=int, default=10)
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    from video_to_video_diffusion_tpu.utils.platform import configure_platform

    configure_platform(cfg.hardware.device)
    m = cfg.model
    # scaling temporarily disabled (scaling_factor=1.0), like the reference
    vae = SliceInterpolationVAE(
        in_channels=m.in_channels, latent_dim=m.latent_dim,
        base_channels=m.vae_base_channels, scaling_factor=1.0,
        num_down_stages=m.vae_num_down_stages, output_tanh=m.vae_output_tanh,
    )
    restored, _ = load_checkpoint(args.checkpoint)
    params = restored["params"]
    if "vae" in params:
        params = params["vae"]
    encode = jax.jit(lambda x: vae.apply({"params": params}, x, method=vae.encode))

    if m.residual_mode:
        # residual mode: the VAE encodes (thin - trilinear(thick)) * gain,
        # so that's the distribution whose latent std sets the scale
        from video_to_video_diffusion_tpu.ops.resize import resize_trilinear

        gain = m.residual_gain

        def _residual(thick, thin):
            cond = resize_trilinear(
                thick.astype(jnp.float32), (thin.shape[1], thin.shape[2], thin.shape[3])
            )
            return (thin.astype(jnp.float32) - cond) * gain

        residual = jax.jit(_residual)

    loader = get_unified_dataloader(cfg, "train")
    stds, means = [], []
    for i, batch in enumerate(loader):
        if i >= args.num_batches:
            break
        x = jnp.asarray(batch["target"])
        if m.residual_mode:
            x = residual(jnp.asarray(batch["input"]), x)
        z = np.asarray(encode(x))
        stds.append(float(z.std()))
        means.append(float(z.mean()))
    std = float(np.mean(stds))
    scale = 1.0 / std
    out = {
        "latent_mean": float(np.mean(means)),
        "latent_std": std,
        "recommended_scaling_factor": scale,
        "sd_vae_scaling_factor": SD_SCALE,
        "ratio_vs_sd": scale / SD_SCALE,
        "batches": len(stds),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
