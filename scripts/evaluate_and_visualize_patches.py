"""Diffusion patch evaluation + visualization.

Rebuild of scripts/evaluate_and_visualize_patches.py from the reference —
with the real `model.generate` DDIM path restored (the reference ships with
it commented out and replaced by a VAE-reconstruction debug path,
:199-213). Produces per-sample PSNR/SSIM, JSON + CSV, and 3-row
Input/Target/Prediction PNG grids.

Usage:
  python scripts/evaluate_and_visualize_patches.py --checkpoint <dir> \
      [--config slice_interpolation_full_medium] [--split val] \
      [--num-samples 10] [--sampler ddim] [--steps 20] [--viz-dir out/]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_to_video_diffusion_tpu.config import load_config
from video_to_video_diffusion_tpu.data.loader import get_unified_dataloader
from video_to_video_diffusion_tpu.data.windowing import from_model_range
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
from video_to_video_diffusion_tpu.utils.checkpoint import load_checkpoint
from video_to_video_diffusion_tpu.utils.metrics import calculate_video_metrics


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="slice_interpolation_full_medium")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--num-samples", type=int, default=10)
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "ddpm", "edm"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--output", default="patch_eval")
    ap.add_argument("--viz-dir", default=None)
    ap.add_argument(
        "--quant", default=None, choices=["int8", "int8_static"],
        help="run the sampling scan on the w8a8 UNet (ddim/edm only; "
        "measures int8 quality vs the full-precision path). int8_static "
        "calibrates per-site activation scales on the first ddim sample "
        "and reuses them (no per-conv abs-max passes)",
    )
    ap.add_argument(
        "--quant-vae", default=None, choices=["int8"],
        help="decode on the w8a8 decoder (measures decoder-int8 quality "
        "vs the full-precision decode)",
    )
    ap.add_argument(
        "--params", default="auto", choices=["auto", "ema", "raw"],
        help="which weights to score: auto = EMA when present (what "
        "best-checkpoint selection scored), raw = live params (use for "
        "checkpoints written before EMA decay warmup, where an early EMA "
        "still carries the random init)",
    )
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    from video_to_video_diffusion_tpu.utils.platform import configure_platform

    configure_platform(cfg.hardware.device)
    model = VideoToVideoDiffusion(cfg)
    restored, _meta = load_checkpoint(args.checkpoint)
    use_ema = (
        args.params == "ema"
        or (args.params == "auto" and restored.get("ema_params") is not None)
    )
    if args.params == "ema" and restored.get("ema_params") is None:
        raise SystemExit("--params ema: checkpoint has no ema_params")
    params = restored["ema_params"] if use_ema else restored["params"]

    loader = get_unified_dataloader(cfg, args.split)
    if args.sampler in ("ddim", "edm"):
        from video_to_video_diffusion_tpu.inference.pipeline import staged_generate

        def gen(v, k, td):
            return staged_generate(
                model, params, v, k, args.steps, target_depth=td,
                sampler=args.sampler, quant=args.quant,
                quant_vae=args.quant_vae,
            )
    else:
        if args.quant or args.quant_vae:
            raise SystemExit("--quant/--quant-vae require --sampler ddim or edm")
        _g = jax.jit(
            lambda v, k, td: model.generate(params, v, k, args.sampler, args.steps, target_depth=td),
            static_argnums=(2,),
        )
        gen = _g

    rows = []
    key = jax.random.PRNGKey(0)
    seen = 0
    for batch in loader:
        key, k = jax.random.split(key)
        td = batch["target"].shape[1]
        pred = np.asarray(gen(jnp.asarray(batch["input"]), k, td))
        for b in range(pred.shape[0]):
            m = calculate_video_metrics(
                from_model_range(pred[b : b + 1]), from_model_range(batch["target"][b : b + 1])
            )
            rows.append(
                {"patient_id": batch["patient_id"][b], "psnr": m["psnr"], "ssim": m["ssim"]}
            )
            if args.viz_dir and seen < 8:
                _save_grid(args.viz_dir, seen, batch["input"][b], batch["target"][b], pred[b])
            seen += 1
        if seen >= args.num_samples:
            break

    psnrs = [r["psnr"] for r in rows]
    ssims = [r["ssim"] for r in rows]
    summary = {
        "sampler": args.sampler,
        "quant": args.quant,
        "quant_vae": args.quant_vae,
        "params": "ema" if use_ema else "raw",
        "steps": args.steps,
        "num_samples": len(rows),
        "psnr_mean": float(np.mean(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
    }
    with open(args.output + ".json", "w") as f:
        json.dump({"summary": summary, "per_sample": rows}, f, indent=2)
    with open(args.output + ".csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["patient_id", "psnr", "ssim"])
        w.writeheader()
        w.writerows(rows)
    print(json.dumps(summary))
    return summary


def _save_grid(viz_dir, idx, v_in, v_gt, v_pred, n_cols: int = 6):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    os.makedirs(viz_dir, exist_ok=True)
    cols = min(n_cols, v_gt.shape[0])
    idxs = np.linspace(0, v_gt.shape[0] - 1, cols).astype(int)
    in_idxs = np.linspace(0, v_in.shape[0] - 1, cols).astype(int)
    fig, axes = plt.subplots(3, cols, figsize=(2 * cols, 6))
    for c in range(cols):
        axes[0, c].imshow(v_in[in_idxs[c], :, :, 0], cmap="gray", vmin=-1, vmax=1)
        axes[1, c].imshow(v_gt[idxs[c], :, :, 0], cmap="gray", vmin=-1, vmax=1)
        axes[2, c].imshow(v_pred[idxs[c], :, :, 0], cmap="gray", vmin=-1, vmax=1)
        for r in range(3):
            axes[r, c].axis("off")
    axes[0, 0].set_ylabel("input")
    axes[1, 0].set_ylabel("target")
    axes[2, 0].set_ylabel("pred")
    fig.savefig(os.path.join(viz_dir, f"patch_eval_{idx:03d}.png"), dpi=90)
    plt.close(fig)


if __name__ == "__main__":
    main()
