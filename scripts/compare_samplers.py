"""Sampler-efficiency study: PSNR/SSIM vs step count for DDIM and EDM.

Runs the staged patch-generation path on validation patches for each
(sampler, steps) pair and prints a markdown table plus a JSON blob. The
point of the study: EDM's 2nd-order Heun integration should reach a given
quality with fewer model evaluations (NFE ~= 2*steps-1) than first-order
DDIM (NFE = steps) — the table shows quality per NFE side by side.

Usage:
  python scripts/compare_samplers.py --config runs/diff_tpu.yaml \
      --checkpoint <best_ckpt_dir> [--num-samples 4] [--steps 5,10,20,50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--num-samples", type=int, default=4)
    ap.add_argument("--steps", default="5,10,20,50")
    ap.add_argument("--samplers", default="ddim,edm")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    from video_to_video_diffusion_tpu.config import load_config
    from video_to_video_diffusion_tpu.utils.platform import (
        configure_platform,
        enable_compilation_cache,
    )

    cfg = load_config(args.config)
    configure_platform(cfg.hardware.device)
    enable_compilation_cache()

    from video_to_video_diffusion_tpu.data.loader import get_unified_dataloader
    from video_to_video_diffusion_tpu.inference.pipeline import staged_generate
    from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
    from video_to_video_diffusion_tpu.utils.checkpoint import load_checkpoint
    from video_to_video_diffusion_tpu.utils.metrics import (
        calculate_psnr,
        calculate_ssim,
    )

    model = VideoToVideoDiffusion(cfg)
    restored, _ = load_checkpoint(args.checkpoint)
    # prefer the EMA average when present: best-checkpoint selection during
    # training scores the EMA weights, so they are the certified ones
    params = restored.get("ema_params") if restored.get("ema_params") is not None else restored["params"]

    loader = get_unified_dataloader(cfg, "val")
    batches = []
    for i, b in enumerate(loader):
        if i >= args.num_samples:
            break
        batches.append(b)

    results = []
    for sampler in args.samplers.split(","):
        for steps in (int(s) for s in args.steps.split(",")):
            psnrs, ssims = [], []
            for i, b in enumerate(batches):
                v_in = b["input"][:1]
                v_gt = np.asarray(b["target"][:1])
                out = staged_generate(
                    model, params, v_in, jax.random.PRNGKey(1000 + i),
                    steps, target_depth=v_gt.shape[1], sampler=sampler,
                )
                pred01 = (np.asarray(out) + 1.0) / 2.0
                gt01 = (v_gt + 1.0) / 2.0
                psnrs.append(float(calculate_psnr(pred01, gt01)))
                ssims.append(float(calculate_ssim(pred01, gt01)))
            if sampler == "edm":
                from video_to_video_diffusion_tpu.inference.sampler import edm_sigmas

                # actual grid can be shorter than requested (dedup on snap)
                nfe = 2 * len(edm_sigmas(model.schedule, steps)[0]) - 1
            else:
                nfe = steps
            row = {
                "sampler": sampler,
                "steps": steps,
                "nfe": nfe,
                "psnr": float(np.mean(psnrs)),
                "ssim": float(np.mean(ssims)),
            }
            results.append(row)
            print(f"{sampler:5s} steps={steps:3d} nfe={nfe:3d} "
                  f"psnr={row['psnr']:.2f} ssim={row['ssim']:.3f}", flush=True)

    print("\n| sampler | steps | NFE | PSNR (dB) | SSIM |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r['sampler']} | {r['steps']} | {r['nfe']} "
              f"| {r['psnr']:.2f} | {r['ssim']:.3f} |")
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
