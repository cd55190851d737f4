"""Full-volume slice-interpolation inference CLI (the serving entry point).

The reference has no end-user inference script — its generation path is
reachable only through the eval/visualization scripts. This CLI is the
production flow the README's north star describes: thick-slice CT in
(DICOM series directory, cached .npz case, or synthetic phantom) ->
windowed [-1, 1] volume -> pipelined patch-stitched generation
(inference/pipeline.py; reference models/model.py:282-420 semantics) ->
thin-slice volume out as .npz and optionally as a DICOM series
(data/dicom.py writer, HU restored by inverting the window).

Usage:
  python scripts/generate_volume.py --checkpoint <dir> --input <case.npz|dicom_dir> \
      [--config slice_interpolation_full_medium] [--sampler ddim] [--steps 50] \
      [--quant int8_static] [--quant-vae int8] [--params auto|ema|raw] \
      [--patch 8 192 192] [--target-patch 48 192 192] [--stride 4 96 96] \
      [--vae-batch 5] [--mesh] [--output out.npz] [--dicom-out out_dir/]

  --mesh fans the patch grid over every visible chip
  (parallel/stitching.sample_with_stitching_sharded); default is the
  single-chip pipelined path (the 18.6x headline configuration with
  --quant int8_static --quant-vae int8).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from video_to_video_diffusion_tpu.utils.logger import setup_logger

logger = setup_logger("generate_volume")


def _load_input(args) -> tuple[np.ndarray, float]:
    """Returns ((1, D, H, W, 1) [-1, 1] f32, source slice thickness)."""
    from video_to_video_diffusion_tpu.data.windowing import apply_ct_windowing

    if args.synthetic is not None:
        from video_to_video_diffusion_tpu.data.synthetic import synthetic_patient_pair

        thick_hu, _ = synthetic_patient_pair(
            args.synthetic, thin_depth=args.synthetic_depth * args.ratio,
            height=args.synthetic_size, width=args.synthetic_size,
            thick_ratio=args.ratio,
        )
        vol = apply_ct_windowing(
            thick_hu, args.window_center, args.window_width, pm1=True
        )
        return vol[None, ..., None].astype(np.float32), float(args.ratio)
    if os.path.isdir(args.input):
        from video_to_video_diffusion_tpu.data.dicom import load_dicom_volume

        hu, thickness = load_dicom_volume(args.input)
        logger.info(
            "DICOM series: %s -> %s HU volume, slice thickness %.2f",
            args.input, hu.shape, thickness,
        )
        vol = apply_ct_windowing(hu, args.window_center, args.window_width, pm1=True)
        return vol[None, ..., None].astype(np.float32), float(thickness)
    if args.input.endswith(".npz"):
        with np.load(args.input) as z:
            if args.input_key not in z:
                raise SystemExit(
                    f"--input-key {args.input_key!r} not in {args.input} "
                    f"(has {sorted(z.keys())})"
                )
            vol = np.asarray(z[args.input_key], np.float32)
            # Caches written by data/datasets.py record the HU window they
            # were built with; honor it so a later --dicom-out inverts the
            # RIGHT window instead of the CLI default.
            if "window_center" in z and "window_width" in z:
                wc, ww = float(z["window_center"]), float(z["window_width"])
                if (wc, ww) != (args.window_center, args.window_width):
                    logger.info(
                        "using the cache's HU window C=%.0f/W=%.0f "
                        "(overrides --window-center/--window-width)", wc, ww,
                    )
                args.window_center, args.window_width = wc, ww
            elif args.dicom_out:
                logger.warning(
                    "%s carries no window metadata; --dicom-out will invert "
                    "the CLI window C=%.0f/W=%.0f — HU values are wrong if "
                    "the volume was windowed differently",
                    args.input, args.window_center, args.window_width,
                )
        if vol.ndim == 5:  # already batched/channeled
            return vol, 1.0
        if vol.ndim == 4:  # (D, H, W, C)
            return vol[None], 1.0
        return vol[None, ..., None], 1.0
    raise SystemExit(f"--input {args.input}: not a .npz file or DICOM directory")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="slice_interpolation_full_medium")
    ap.add_argument("--checkpoint", required=True)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", default=None,
                     help=".npz case (see --input-key) or DICOM series dir")
    src.add_argument("--synthetic", type=int, default=None, metavar="SEED",
                     help="generate a synthetic thick phantom instead")
    ap.add_argument("--input-key", default="input",
                    help=".npz key holding the [-1,1] thick volume")
    ap.add_argument("--synthetic-depth", type=int, default=8)
    ap.add_argument("--synthetic-size", type=int, default=512)
    ap.add_argument("--window-center", type=float, default=40.0)
    ap.add_argument("--window-width", type=float, default=400.0)
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "ddpm", "edm"])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quant", default=None, choices=["int8", "int8_static"])
    ap.add_argument("--quant-vae", default=None, choices=["int8"])
    ap.add_argument("--params", default="auto", choices=["auto", "ema", "raw"])
    ap.add_argument("--patch", type=int, nargs=3, default=[8, 192, 192],
                    metavar=("D", "H", "W"))
    ap.add_argument("--target-patch", type=int, nargs=3, default=[48, 192, 192],
                    metavar=("D", "H", "W"))
    ap.add_argument("--stride", type=int, nargs=3, default=[4, 96, 96],
                    metavar=("D", "H", "W"))
    ap.add_argument("--vae-batch", type=int, default=5)
    ap.add_argument("--mesh", action="store_true",
                    help="fan the patch grid over all visible devices")
    ap.add_argument("--output", default="generated_volume.npz")
    ap.add_argument("--dicom-out", default=None,
                    help="also write the thin volume as a DICOM series")
    args = ap.parse_args(argv)
    if args.target_patch[0] % args.patch[0]:
        raise SystemExit(
            f"--target-patch depth {args.target_patch[0]} must be a multiple "
            f"of --patch depth {args.patch[0]}"
        )
    if args.target_patch[1:] != args.patch[1:]:
        raise SystemExit(
            "the model super-resolves depth only: --target-patch H W "
            f"{args.target_patch[1:]} must equal --patch H W {args.patch[1:]}"
        )
    args.ratio = args.target_patch[0] // args.patch[0]
    if (args.quant or args.quant_vae) and args.sampler not in ("ddim", "edm"):
        raise SystemExit("--quant/--quant-vae require --sampler ddim or edm")
    if args.quant == "int8_static" and args.sampler != "ddim":
        raise SystemExit(
            "--quant int8_static requires --sampler ddim (the activation-"
            "scale calibration pass runs a ddim trajectory); use --quant "
            "int8 with edm"
        )

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

    from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
    from video_to_video_diffusion_tpu.utils.checkpoint import load_checkpoint

    v_in, thickness = _load_input(args)
    logger.info("input volume: %s in [%.3f, %.3f]",
                v_in.shape, float(v_in.min()), float(v_in.max()))

    model = VideoToVideoDiffusion(cfg)
    restored, _meta = load_checkpoint(args.checkpoint)
    use_ema = (
        args.params == "ema"
        or (args.params == "auto" and restored.get("ema_params") is not None)
    )
    if args.params == "ema" and restored.get("ema_params") is None:
        raise SystemExit("--params ema: checkpoint has no ema_params")
    params = restored["ema_params"] if use_ema else restored["params"]

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    if args.mesh and len(jax.devices()) > 1:
        from video_to_video_diffusion_tpu.parallel.mesh import make_mesh
        from video_to_video_diffusion_tpu.parallel.stitching import (
            sample_with_stitching_sharded,
        )

        mesh = make_mesh()
        logger.info("stitching over mesh %s", dict(mesh.shape))
        out = sample_with_stitching_sharded(
            model, params, mesh, jnp.asarray(v_in), key,
            num_inference_steps=args.steps,
            patch_size=tuple(args.patch),
            target_patch_size=tuple(args.target_patch),
            stride=tuple(args.stride),
            sampler=args.sampler, eta=args.eta,
            quant=args.quant, quant_vae=args.quant_vae,
        )
    else:
        if args.mesh:
            logger.warning("--mesh requested but only 1 device visible; single-chip path")
        from video_to_video_diffusion_tpu.inference.pipeline import generate_volume

        out = generate_volume(
            model, params, jnp.asarray(v_in), key,
            num_inference_steps=args.steps,
            patch_size=tuple(args.patch),
            target_patch_size=tuple(args.target_patch),
            stride=tuple(args.stride),
            vae_batch=args.vae_batch,
            eta=args.eta, sampler=args.sampler,
            quant=args.quant, quant_vae=args.quant_vae,
        )
    out_np = np.asarray(out, np.float32)  # host readback = sync
    dt = time.time() - t0
    logger.info("generated %s in %.1f s (incl. compile on first run)",
                out_np.shape, dt)

    thin = out_np[0, ..., 0]  # (D_thin, H, W) in [-1, 1]
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    np.savez_compressed(
        args.output,
        volume=thin.astype(np.float16),
        window_center=args.window_center,
        window_width=args.window_width,
        sampler=args.sampler,
        steps=args.steps,
    )
    logger.info("wrote %s", args.output)

    if args.dicom_out:
        from video_to_video_diffusion_tpu.data.dicom import write_minimal_dicom

        os.makedirs(args.dicom_out, exist_ok=True)
        lo = args.window_center - args.window_width / 2.0
        hu = (thin + 1.0) / 2.0 * args.window_width + lo  # invert the window
        thin_thickness = thickness / args.ratio if thickness > 0 else 1.0
        for i in range(hu.shape[0]):
            write_minimal_dicom(
                os.path.join(args.dicom_out, f"slice_{i:04d}.dcm"),
                hu[i], instance_number=i + 1,
                z_position=i * thin_thickness,
                slice_thickness=thin_thickness,
            )
        logger.info("wrote %d DICOM slices to %s", hu.shape[0], args.dicom_out)

    summary = {
        "output": args.output,
        "shape": list(out_np.shape),
        "sampler": args.sampler,
        "steps": args.steps,
        "quant": args.quant,
        "quant_vae": args.quant_vae,
        "params": "ema" if use_ema else "raw",
        "seconds": round(dt, 3),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
