"""Diffusion training CLI.

Rebuild of the reference entry point (training/train.py:47-307): load config,
build the composite model, load + freeze the pretrained VAE, build the three
dataloaders (train patches / val patches / optional full-volume val), build
the layer-wise-LR optimizer, auto-resume from the newest best checkpoint, run
the Trainer, final full validation.

CLI: python -m video_to_video_diffusion_tpu.training.train --config ... [--resume ...]
"""

from __future__ import annotations

import argparse
from typing import Dict, Optional

import jax

from video_to_video_diffusion_tpu.config import Config, load_config
from video_to_video_diffusion_tpu.data.loader import get_unified_dataloader
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
from video_to_video_diffusion_tpu.parallel.mesh import make_mesh
from video_to_video_diffusion_tpu.training.trainer import Trainer
from video_to_video_diffusion_tpu.utils.checkpoint import (
    find_best_checkpoint,
    load_checkpoint,
)
from video_to_video_diffusion_tpu.utils.logger import setup_logger


def _resolve_vae_checkpoint(checkpoint_path: str) -> str:
    """Accept a checkpoint dir OR an ancestor directory of one.

    When pointed at e.g. the VAE trainer's checkpoint_dir root (which holds
    <experiment>/vae_best_*/...), pick the newest vae_best_* anywhere below,
    falling back to the newest vae_epoch_* — the path-discovery half of the
    reference's VAE loading (training/train.py:77-106 + shell glob in
    kub_files/vae-training-job-a100.yaml:35-60). Note the newest match by
    mtime across ALL experiments under the directory wins; the resolved path
    is logged so any cross-experiment substitution is visible.
    """
    import glob as _glob
    import os as _os

    p = str(checkpoint_path)
    if not _os.path.isdir(p):
        return p  # let load_checkpoint raise its FileNotFoundError
    for pat in ("vae_best*", "vae_epoch*"):
        hits = [
            h
            for h in _glob.glob(_os.path.join(p, "**", pat), recursive=True)
            if _os.path.isdir(h) and not h.endswith(".orbax-checkpoint-tmp")
        ]
        if hits:
            resolved = max(hits, key=_os.path.getmtime)
            if _os.path.abspath(resolved) != _os.path.abspath(p):
                setup_logger("train").info(
                    "resolved VAE checkpoint %s -> %s (newest %s by mtime)",
                    p, resolved, pat,
                )
            return resolved
    return p


def load_vae_into_params(params, checkpoint_path: str):
    """Replace params['vae'] with a VAE checkpoint's weights.

    Accepts either a VAETrainer checkpoint ({'params': vae_params, ...}), a
    full diffusion checkpoint ({'params': {'vae': ..., 'unet': ...}}), or a
    directory containing vae_best_*/vae_epoch_* checkpoints — the
    multi-format sniffing the reference does at training/train.py:77-106.
    """
    restored, _meta = load_checkpoint(_resolve_vae_checkpoint(checkpoint_path))
    inner = restored.get("params", restored)
    if "vae" in inner:
        vae_params = inner["vae"]
    elif "encoder" in inner:
        vae_params = inner
    else:
        raise ValueError(f"unrecognized VAE checkpoint layout: {list(inner)[:5]}")
    new = dict(params)
    new["vae"] = jax.tree_util.tree_map(lambda x: x, vae_params)
    return new


def main(argv=None) -> Dict[str, float]:
    parser = argparse.ArgumentParser(description="Train the latent diffusion model")
    parser.add_argument("--config", type=str, default="slice_interpolation_full_medium")
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument(
        "--reset-ema",
        action="store_true",
        help="on resume, reinitialize ema_params from the live params. Use "
        "when resuming a checkpoint whose EMA predates decay warmup (flat "
        "decay keeps decay^t of the random init, so an early checkpoint's "
        "average scores the init, not the model).",
    )
    parser.add_argument(
        "--init-params",
        type=str,
        default=None,
        metavar="CKPT",
        help="initialize model weights (vae+unet) from a diffusion "
        "checkpoint WITHOUT restoring optimizer/epoch state — fine-tuning "
        "at a new data geometry (the conv/depth-attention stack is "
        "spatial-size-agnostic). Prefers the checkpoint's winning weight "
        "side (ema when meta.best_weights says so). --resume takes "
        "precedence when both are given.",
    )
    parser.add_argument(
        "--profile",
        type=str,
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of a few steady-state training "
        "steps (first epoch, after compile) into DIR",
    )
    args = parser.parse_args(argv)
    logger = setup_logger("train")

    cfg: Config = load_config(args.config)
    from video_to_video_diffusion_tpu.utils.platform import (
        configure_platform,
        enable_compilation_cache,
    )

    configure_platform(cfg.hardware.device)
    enable_compilation_cache()
    model = VideoToVideoDiffusion(cfg)

    mesh = None
    if cfg.hardware.distributed and len(jax.devices()) > 1:
        mesh = make_mesh(
            cfg.hardware.num_devices,
            tensor_parallel=max(cfg.hardware.mesh_tensor_axis, 1),
            data_parallel=max(cfg.hardware.mesh_data_axis, 0),
        )
        logger.info("mesh: %s", mesh)

    # dataloaders (reference train.py:127-158)
    train_loader = get_unified_dataloader(cfg, "train")
    val_loader = get_unified_dataloader(cfg, "val")
    full_val_loader = None
    if not cfg.data.use_patches or cfg.training.final_val_full_volumes:
        full_cfg = load_config({**cfg.to_dict(), "data": {**cfg.to_dict()["data"], "use_patches": False, "batch_size": 1}})
        full_val_loader = get_unified_dataloader(full_cfg, "val")

    # init params + pretrained VAE load/freeze (reference train.py:71-116)
    key = jax.random.PRNGKey(cfg.data.seed)
    params = model.init(
        key, patch_shape=(cfg.data.patch_depth_thick, *cfg.data.patch_size), batch=1
    )
    if args.init_params:
        restored, meta = load_checkpoint(args.init_params)
        side = (
            "ema_params"
            if restored.get("ema_params") is not None
            and meta.get("best_weights", "ema") == "ema"
            else "params"
        )
        params = restored[side]
        logger.info("initialized weights from %s (%s side)", args.init_params, side)
    if cfg.pretrained.use_pretrained and cfg.pretrained.vae_enabled and cfg.pretrained.vae_checkpoint_path:
        params = load_vae_into_params(params, cfg.pretrained.vae_checkpoint_path)
        logger.info("loaded VAE from %s", cfg.pretrained.vae_checkpoint_path)
    # Freezing is the optimizer's job: lr multipliers 0.0 for vae_* groups
    # (config pretrained.layer_lr_multipliers), enforced in make_optimizer.

    trainer = Trainer(
        model, cfg, train_loader, val_loader, full_val_loader,
        mesh=mesh, params=params, rng_seed=cfg.data.seed,
    )
    if args.profile:
        trainer.profile_dir = args.profile
    resume = args.resume or find_best_checkpoint(trainer.ckpt_dir, trainer.suffix)
    if resume:
        trainer.load_checkpoint(resume)
        if args.reset_ema:
            trainer.reset_ema()
    return trainer.train()


if __name__ == "__main__":
    main()
