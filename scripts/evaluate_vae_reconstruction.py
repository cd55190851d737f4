"""VAE reconstruction evaluation (reference scripts/evaluate_vae_reconstruction.py).

Encode->decode validation patches, report PSNR/SSIM stats (mean/std/min/max),
write JSON + CSV, optionally save matplotlib comparison PNGs. Target:
PSNR >= 35 dB (reference README.md:48).

Usage:
  python scripts/evaluate_vae_reconstruction.py --config vae_training \
      --checkpoint <vae ckpt dir> [--num-samples 50] [--split val] [--viz-dir out/]
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
from video_to_video_diffusion_tpu.models.vae import SliceInterpolationVAE
from video_to_video_diffusion_tpu.utils.checkpoint import load_checkpoint
from video_to_video_diffusion_tpu.utils.metrics import calculate_video_metrics


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="vae_training")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--slice-type", default="thin", choices=["thin", "thick"],
                    help="evaluate thin (target) or thick (input) slices — "
                         "the reference's VAE eval job runs both "
                         "(kub_files/vae-evaluation-job.yaml:52-79)")
    ap.add_argument("--num-samples", type=int, default=50)
    ap.add_argument("--output", default="vae_eval")
    ap.add_argument("--viz-dir", default=None)
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    from video_to_video_diffusion_tpu.utils.platform import configure_platform

    configure_platform(cfg.hardware.device)
    m = cfg.model
    vae = SliceInterpolationVAE(
        in_channels=m.in_channels, latent_dim=m.latent_dim,
        base_channels=m.vae_base_channels, scaling_factor=m.vae_scaling_factor,
        num_down_stages=m.vae_num_down_stages, output_tanh=m.vae_output_tanh,
    )
    restored, _ = load_checkpoint(args.checkpoint)
    params = restored["params"]
    if "vae" in params:
        params = params["vae"]
    recon_fn = jax.jit(lambda x: vae.apply({"params": params}, x)[0])

    loader = get_unified_dataloader(cfg, args.split)
    batch_key = "target" if args.slice_type == "thin" else "input"
    rows = []
    seen = 0
    for batch in loader:
        x = jnp.asarray(batch[batch_key])
        recon = np.asarray(recon_fn(x))
        for b in range(x.shape[0]):
            mm = calculate_video_metrics(
                from_model_range(recon[b : b + 1]), from_model_range(np.asarray(x[b : b + 1]))
            )
            rows.append(
                {"patient_id": batch["patient_id"][b], "psnr": mm["psnr"], "ssim": mm["ssim"]}
            )
            if args.viz_dir and seen < 8:
                _save_viz(args.viz_dir, seen, np.asarray(x[b]), recon[b])
            seen += 1
        if seen >= args.num_samples:
            break

    psnrs = [r["psnr"] for r in rows]
    ssims = [r["ssim"] for r in rows]
    summary = {
        "num_samples": len(rows),
        "psnr_mean": float(np.mean(psnrs)), "psnr_std": float(np.std(psnrs)),
        "psnr_min": float(np.min(psnrs)), "psnr_max": float(np.max(psnrs)),
        "ssim_mean": float(np.mean(ssims)), "ssim_std": float(np.std(ssims)),
        "meets_35db_target": bool(np.mean(psnrs) >= 35.0),
    }
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output + ".json", "w") as f:
        json.dump({"summary": summary, "per_sample": rows}, f, indent=2)
    with open(args.output + ".csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["patient_id", "psnr", "ssim"])
        w.writeheader()
        w.writerows(rows)
    print(json.dumps(summary))
    return summary


def _save_viz(viz_dir, idx, x, recon):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    os.makedirs(viz_dir, exist_ok=True)
    mid = x.shape[0] // 2
    fig, axes = plt.subplots(1, 3, figsize=(9, 3))
    axes[0].imshow(x[mid, :, :, 0], cmap="gray", vmin=-1, vmax=1)
    axes[0].set_title("input")
    axes[1].imshow(recon[mid, :, :, 0], cmap="gray", vmin=-1, vmax=1)
    axes[1].set_title("recon")
    axes[2].imshow(np.abs(x[mid, :, :, 0] - recon[mid, :, :, 0]), cmap="hot")
    axes[2].set_title("|err|")
    for a in axes:
        a.axis("off")
    fig.savefig(os.path.join(viz_dir, f"vae_recon_{idx:03d}.png"), dpi=90)
    plt.close(fig)


if __name__ == "__main__":
    main()
