"""Residual-VAE ceiling at a given patch geometry: floor / ceiling / oracle.

For the residual parametrization (models/model.py residualize/compose_residual)
the best any diffusion model can do at lambda=1 is bounded by the frozen VAE's
reconstruction of the TRUE residual:

  floor    tri                                  (predict zero residual)
  ceiling  tri + decode(encode((thin-tri)*g))/g (perfect latent prediction)
  oracle   clean signal vs noisy target         (the noise-imposed limit)

This script draws val patches at the config's geometry, scores all three on
the same patches, and prints one JSON line — the table VERDICT r4 #8 asks
for, re-scorable at any geometry (96^2 training vs 192^2 production patches).

Usage:
  python scripts/residual_vae_ceiling.py --config config/runs/diff_res5.yaml \
      --vae artifacts/vae_res3_best [--split val] [--num-patches 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from video_to_video_diffusion_tpu.utils.logger import setup_logger

logger = setup_logger("residual_vae_ceiling")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--vae", required=True,
                    help="VAE checkpoint (vae trainer or diffusion layout)")
    ap.add_argument("--split", default="val")
    ap.add_argument("--num-patches", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--output", default=None)
    args = ap.parse_args(argv)

    from video_to_video_diffusion_tpu.config import load_config

    cfg = load_config(args.config)
    from video_to_video_diffusion_tpu.utils.platform import (
        configure_platform,
        enable_compilation_cache,
    )

    configure_platform(cfg.hardware.device)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from video_to_video_diffusion_tpu.data.datasets import (
        PatchSliceInterpolationDataset,
    )
    from video_to_video_diffusion_tpu.data.synthetic import synthetic_patient_pair
    from video_to_video_diffusion_tpu.data.windowing import (
        apply_ct_windowing,
        from_model_range,
    )
    from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
    from video_to_video_diffusion_tpu.training.train import load_vae_into_params
    from video_to_video_diffusion_tpu.utils.metrics import calculate_video_metrics

    assert cfg.model.residual_mode, "this script measures the residual-mode ceiling"
    model = VideoToVideoDiffusion(cfg)
    d = cfg.data
    params = model.init(
        jax.random.PRNGKey(0),
        patch_shape=(d.patch_depth_thick, *d.patch_size),
        batch=1,
    )
    params = load_vae_into_params(params, args.vae)

    ds = PatchSliceInterpolationDataset(cfg, args.split)
    rng = np.random.default_rng(args.seed)

    recon = jax.jit(
        lambda p, r: model.decode(p, model.encode(p, r), f32=True).astype(
            jnp.float32
        )
    )

    n = min(args.num_patches, len(ds))
    rows = []
    clean_cache = {}
    for i0 in range(0, n, args.batch):
        idxs = list(range(i0, min(i0 + args.batch, n)))
        thick = np.stack(
            [ds.__getitem__(i, seed=args.seed + i)["input"] for i in idxs]
        )
        thin = np.stack(
            [ds.__getitem__(i, seed=args.seed + i)["target"] for i in idxs]
        )
        cond_up, r = model.residualize(jnp.asarray(thick), jnp.asarray(thin))
        r_hat = recon(params, r)
        ceiling = np.asarray(model.compose_residual(cond_up, r_hat))
        tri = np.asarray(jnp.clip(cond_up, -1.0, 1.0))
        for j, i in enumerate(idxs):
            t01 = from_model_range(thin[j][None])
            m_f = calculate_video_metrics(from_model_range(tri[j][None]), t01)
            m_c = calculate_video_metrics(from_model_range(ceiling[j][None]), t01)
            rows.append(
                {
                    "floor_psnr": m_f["psnr"],
                    "ceiling_psnr": m_c["psnr"],
                    "floor_ssim": m_f["ssim"],
                    "ceiling_ssim": m_c["ssim"],
                }
            )

    # noise oracle on the underlying full volumes of this split (clean signal
    # vs the cached noisy target), geometry-matched to the cache
    base = ds.base
    oracle = []
    for i in range(min(len(base), 8)):
        s = base[i]
        if not s["patient_id"].startswith("SYN__"):
            continue
        idx = int(s["patient_id"].split("__")[1])
        thin = np.asarray(s["target"], np.float32)
        key = (idx, thin.shape)
        if key not in clean_cache:
            _, clean_hu = synthetic_patient_pair(
                d.seed + idx, thin_depth=thin.shape[0], height=thin.shape[1],
                width=thin.shape[2], noise_sigma=0.0,
            )
            clean_cache[key] = apply_ct_windowing(
                clean_hu, d.window_center, d.window_width, pm1=True
            )[..., None].astype(np.float32)
        m = calculate_video_metrics(
            from_model_range(clean_cache[key][None]),
            from_model_range(thin[None]),
        )
        oracle.append(m["psnr"])

    def _m(k):
        return round(float(np.mean([r[k] for r in rows])), 3)

    summary = {
        "split": args.split,
        "patch": [d.patch_depth_thick, d.patch_depth_thin, *d.patch_size],
        "num_patches": len(rows),
        "floor_psnr": _m("floor_psnr"),
        "ceiling_psnr": _m("ceiling_psnr"),
        "floor_ssim": _m("floor_ssim"),
        "ceiling_ssim": _m("ceiling_ssim"),
        "noise_oracle_psnr": round(float(np.mean(oracle)), 3) if oracle else None,
        "headroom_db": round(_m("ceiling_psnr") - _m("floor_psnr"), 3),
    }
    print(json.dumps(summary))
    if args.output:
        with open(args.output + ".json", "w") as f:
            json.dump({"summary": summary, "per_patch": rows}, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
