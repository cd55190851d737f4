"""Noise-imposed quality ceiling of the synthetic phantom benchmark.

The synthetic thin volumes carry sigma=8 HU additive Gaussian acquisition
noise (data/synthetic.py) that no generator can predict — it is independent
of the conditioning. The best possible MSE against the noisy target is
therefore achieved by the clean signal itself (the oracle), which puts a
hard PSNR/SSIM ceiling on every model trained and evaluated on these
phantoms. This script measures that ceiling empirically, plus two context
baselines, in the same [0,1]-windowed space as every metric in the repo
(utils/metrics.py contract):

  oracle    clean thin signal vs noisy thin target      <- the ceiling
  trilinear thick volume trilinearly upsampled 5x        <- naive baseline
  closed    -20*log10(f*sigma_w^2)^0.5 analytic bound    <- sanity check

where sigma_w = 8/400 (window width 400 maps HU to [0,1]) and f is the
fraction of voxels whose windowed value is not saturated (air at -1000 HU
clips to the window floor, deleting its noise).

Usage: python scripts/compute_noise_ceiling.py [--num 8] [--sigma 8.0]
Prints one JSON line; paste the numbers into docs/RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=8, help="phantoms to average")
    ap.add_argument("--sigma", type=float, default=8.0, help="noise HU sigma")
    ap.add_argument("--depth", type=int, default=60)
    ap.add_argument("--hw", type=int, default=128)
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from video_to_video_diffusion_tpu.data.synthetic import synthetic_patient_pair
    from video_to_video_diffusion_tpu.data.windowing import apply_ct_windowing
    from video_to_video_diffusion_tpu.ops.resize import resize_trilinear
    from video_to_video_diffusion_tpu.utils.metrics import calculate_video_metrics

    oracle_psnr, oracle_ssim = [], []
    tri_psnr, tri_ssim = [], []
    unsat_frac = []
    for seed in range(args.num):
        thick, thin_noisy = synthetic_patient_pair(
            seed, args.depth, args.hw, args.hw, noise_sigma=args.sigma
        )
        _, thin_clean = synthetic_patient_pair(
            seed, args.depth, args.hw, args.hw, noise_sigma=0.0
        )
        wn = apply_ct_windowing(thin_noisy)[None, ..., None]  # [0,1]
        wc = apply_ct_windowing(thin_clean)[None, ..., None]
        m = calculate_video_metrics(wc, wn)
        oracle_psnr.append(m["psnr"])
        oracle_ssim.append(m["ssim"])
        unsat_frac.append(float(np.mean((wn > 1e-6) & (wn < 1 - 1e-6))))

        wt = apply_ct_windowing(thick)[None, ..., None]
        up = np.asarray(
            resize_trilinear(
                np.asarray(wt, np.float32), (wn.shape[1], args.hw, args.hw)
            )
        )
        m = calculate_video_metrics(up, wn)
        tri_psnr.append(m["psnr"])
        tri_ssim.append(m["ssim"])

    sigma_w = args.sigma / 400.0
    f = float(np.mean(unsat_frac))
    closed = -10.0 * np.log10(f * sigma_w ** 2)
    print(
        json.dumps(
            {
                "oracle_psnr_ceiling_db": round(float(np.mean(oracle_psnr)), 2),
                "oracle_ssim_ceiling": round(float(np.mean(oracle_ssim)), 4),
                "trilinear_psnr_db": round(float(np.mean(tri_psnr)), 2),
                "trilinear_ssim": round(float(np.mean(tri_ssim)), 4),
                "closed_form_psnr_db": round(float(closed), 2),
                "unsaturated_voxel_fraction": round(f, 4),
                "sigma_hu": args.sigma,
                "num_phantoms": args.num,
            }
        )
    )


if __name__ == "__main__":
    main()
