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

Batch serving mode — many volumes, one process, one compile:
  python scripts/generate_volume.py --checkpoint <dir> --input-dir cases/ \
      --output-dir out/ [every flag above]

  Discovers `*.npz` cases and DICOM-series subdirectories under --input-dir,
  runs them through the SAME compiled pipeline stages (same-shape volumes
  reuse the jit cache, so only the first case pays the compile — the
  dominant cost per invocation on a tunneled TPU), and writes
  `<output-dir>/<case>_thin.npz` (+ `<dicom-out>/<case>/` DICOM series if
  requested). Prints one JSON summary line per case plus an aggregate line
  with the steady-state seconds/volume.
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


def _discover_cases(input_dir: str) -> list[tuple[str, str]]:
    """Batch-mode case discovery: sorted (stem, path) for every `*.npz` file
    and every immediate subdirectory containing at least one `.dcm` slice."""
    cases: list[tuple[str, str]] = []
    for name in sorted(os.listdir(input_dir)):
        p = os.path.join(input_dir, name)
        if name.endswith(".npz") and os.path.isfile(p):
            cases.append((name[: -len(".npz")], p))
        elif os.path.isdir(p):
            # an unreadable subdirectory must not kill discovery for the
            # whole batch — skip it loudly (per-case fault isolation)
            try:
                has_dcm = any(f.endswith(".dcm") for f in os.listdir(p))
            except OSError as e:
                logger.warning("skipping unreadable directory %s: %s", p, e)
                continue
            if has_dcm:
                cases.append((name, p))
    return cases


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
    src.add_argument("--input-dir", default=None,
                     help="batch mode: directory of .npz cases and/or DICOM "
                          "series subdirectories; same-shape volumes reuse "
                          "one compile (see module docstring)")
    ap.add_argument("--input-key", default="input",
                    help=".npz key holding the [-1,1] thick volume")
    ap.add_argument("--synthetic-depth", type=int, default=8)
    ap.add_argument("--synthetic-size", type=int, default=512)
    ap.add_argument("--window-center", type=float, default=40.0)
    ap.add_argument("--window-width", type=float, default=400.0)
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "ddpm", "edm"])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--mode", default="sample", choices=["sample", "fidelity"],
                    help="'sample' draws a posterior sample (realistic noise "
                         "texture); 'fidelity' runs the deterministic "
                         "conditional-mean DDIM trajectory (init_scale 0) — "
                         "the PSNR/SSIM-optimal readout (docs/RESULTS.md "
                         "round 5: beats the trilinear floor at lambda=1 on "
                         "both held-out splits)")
    ap.add_argument("--init-scale", type=float, default=None,
                    help="override the z_T scale directly (default: 1.0 for "
                         "--mode sample, 0.0 for --mode fidelity)")
    ap.add_argument("--avg-samples", type=int, default=1,
                    help="average K independent generations (posterior-mean "
                         "approximation; only meaningful with --mode sample)")
    ap.add_argument("--residual-scale", type=float, default=1.0,
                    help="residual-mode shrinkage: emit tri + s*(gen - tri). "
                         "Calibrate s on a validation split "
                         "(scripts/evaluate_full_volumes.py "
                         "--residual-scale-sweep)")
    ap.add_argument("--sample-batch", type=int, default=0,
                    help="chunk the DDIM scan over patch groups (0 = whole "
                         "grid; use on 512^2-class series where the batched "
                         "scan exceeds HBM)")
    ap.add_argument("--encode-batch", type=int, default=0,
                    help="encode-stage chunk size (0 = --vae-batch; set "
                         "large, e.g. the grid size, to cut dispatch "
                         "round-trips — the bench default)")
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
    ap.add_argument("--source-ratio", type=float, default=None,
                    help="thick:thin slice ratio of the SOURCE acquisition "
                         "when it differs from the model's patch geometry "
                         "(target-patch depth / patch depth). The input is "
                         "depth-resampled so the model's ratio spans the "
                         "same physical range the training patches did — "
                         "e.g. --source-ratio 5 for the 5x synthetic cache "
                         "with the default 48/8=6x patch geometry")
    ap.add_argument("--depth-bucket", type=int, default=None,
                    help="edge-pad input depth to a multiple of this before "
                         "stitching so variable-depth series reuse one "
                         "compiled pipeline (output trimmed back); use the "
                         "patch depth, e.g. 8")
    ap.add_argument("--mesh", action="store_true",
                    help="fan the patch grid over all visible devices")
    ap.add_argument("--output", default="generated_volume.npz")
    ap.add_argument("--output-dir", default="generated",
                    help="batch mode: per-case outputs go to "
                         "<output-dir>/<case>_thin.npz (--output is ignored)")
    ap.add_argument("--dicom-out", default=None,
                    help="also write the thin volume as a DICOM series "
                         "(batch mode: a <dicom-out>/<case>/ series per case)")
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

    cases = None
    if args.input_dir:
        cases = _discover_cases(args.input_dir)
        if not cases:
            raise SystemExit(
                f"--input-dir {args.input_dir}: no .npz cases or DICOM "
                "series subdirectories found"
            )

    model = VideoToVideoDiffusion(cfg)
    restored, _meta = load_checkpoint(args.checkpoint)
    use_ema = (
        args.params == "ema"
        or (args.params == "auto" and restored.get("ema_params") is not None)
    )
    if args.params == "ema" and restored.get("ema_params") is None:
        raise SystemExit("--params ema: checkpoint has no ema_params")
    params = restored["ema_params"] if use_ema else restored["params"]

    mesh = None
    if args.mesh:
        if len(jax.devices()) > 1:
            from video_to_video_diffusion_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
            logger.info("stitching over mesh %s", dict(mesh.shape))
        else:
            logger.warning(
                "--mesh requested but only 1 device visible; single-chip path"
            )

    init_scale = args.init_scale
    if init_scale is None:
        init_scale = 0.0 if args.mode == "fidelity" else 1.0
    if args.mode == "fidelity" and args.avg_samples > 1:
        logger.warning(
            "--mode fidelity is deterministic; --avg-samples %d is a no-op "
            "cost multiplier, forcing 1", args.avg_samples
        )
        args.avg_samples = 1

    def _generate(v_in: np.ndarray, key) -> tuple[np.ndarray, float]:
        t0 = time.time()
        if args.source_ratio and args.source_ratio != args.ratio:
            from video_to_video_diffusion_tpu.data.windowing import (
                linear_resample_depth,
            )

            want = max(1, int(round(v_in.shape[1] * args.source_ratio / args.ratio)))
            if want != v_in.shape[1]:
                v_in = linear_resample_depth(np.asarray(v_in[0]), want)[None]
        if mesh is not None:
            from video_to_video_diffusion_tpu.inference.pipeline import (
                pad_depth_to_bucket,
            )
            from video_to_video_diffusion_tpu.parallel.stitching import (
                sample_with_stitching_sharded,
            )

            v_dev = jnp.asarray(v_in)
            d_orig = v_dev.shape[1]
            if args.depth_bucket:
                v_dev, d_orig = pad_depth_to_bucket(v_dev, args.depth_bucket)
            acc = None
            for k in range(max(args.avg_samples, 1)):
                out = sample_with_stitching_sharded(
                    model, params, mesh, v_dev, jax.random.fold_in(key, k),
                    num_inference_steps=args.steps,
                    patch_size=tuple(args.patch),
                    target_patch_size=tuple(args.target_patch),
                    stride=tuple(args.stride),
                    sampler=args.sampler, eta=args.eta,
                    quant=args.quant, quant_vae=args.quant_vae,
                    init_scale=init_scale,
                )
                acc = out if acc is None else acc + out
            out = (acc / max(args.avg_samples, 1))[:, : d_orig * args.ratio]
        else:
            from video_to_video_diffusion_tpu.inference.pipeline import (
                generate_volume,
            )

            acc = None
            for k in range(max(args.avg_samples, 1)):
                out = generate_volume(
                    model, params, jnp.asarray(v_in), jax.random.fold_in(key, k),
                    num_inference_steps=args.steps,
                    patch_size=tuple(args.patch),
                    target_patch_size=tuple(args.target_patch),
                    stride=tuple(args.stride),
                    vae_batch=args.vae_batch,
                    eta=args.eta, sampler=args.sampler,
                    quant=args.quant, quant_vae=args.quant_vae,
                    depth_bucket=args.depth_bucket,
                    init_scale=init_scale,
                    sample_batch=args.sample_batch or None,
                    encode_batch=args.encode_batch or None,
                )
                acc = out if acc is None else acc + out
            out = acc / max(args.avg_samples, 1)
        if getattr(model, "residual_mode", False) and args.residual_scale != 1.0:
            # generation is affine in the decoded residual, so calibrated
            # shrinkage is exact post-hoc: tri + s*(gen - tri)
            from video_to_video_diffusion_tpu.ops.resize import resize_trilinear

            tri = resize_trilinear(
                jnp.asarray(v_in, jnp.float32),
                (out.shape[1], out.shape[2], out.shape[3]),
            )
            s = args.residual_scale
            out = jnp.clip(tri + s * (out - tri), -1.0, 1.0)
        out_np = np.asarray(out, np.float32)  # host readback = sync
        return out_np, time.time() - t0

    def _write_case(case_args, out_np, thickness, output_path, dicom_dir, dt):
        """Write outputs atomically: everything goes to `.tmp` paths first and
        is renamed into place only after ALL writes succeed, so a mid-write
        failure never leaves a partial <case>_thin.npz (or DICOM series) that
        disagrees with the JSON summary."""
        import shutil

        thin = out_np[0, ..., 0]  # (D_thin, H, W) in [-1, 1]
        os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
        tmp_npz = output_path + ".tmp"
        tmp_dicom = dicom_dir.rstrip("/\\") + ".tmp" if dicom_dir else None
        try:
            with open(tmp_npz, "wb") as f:
                np.savez_compressed(
                    f,
                    volume=thin.astype(np.float16),
                    window_center=case_args.window_center,
                    window_width=case_args.window_width,
                    sampler=args.sampler,
                    steps=args.steps,
                )
            n_dcm = 0
            if dicom_dir:
                from video_to_video_diffusion_tpu.data.dicom import (
                    write_minimal_dicom,
                )

                shutil.rmtree(tmp_dicom, ignore_errors=True)
                os.makedirs(tmp_dicom)
                lo = case_args.window_center - case_args.window_width / 2.0
                # invert the window: [-1, 1] -> HU
                hu = (thin + 1.0) / 2.0 * case_args.window_width + lo
                thin_thickness = thickness / args.ratio if thickness > 0 else 1.0
                for i in range(hu.shape[0]):
                    write_minimal_dicom(
                        os.path.join(tmp_dicom, f"slice_{i:04d}.dcm"),
                        hu[i], instance_number=i + 1,
                        z_position=i * thin_thickness,
                        slice_thickness=thin_thickness,
                    )
                n_dcm = hu.shape[0]
            # commit
            os.replace(tmp_npz, output_path)
            if dicom_dir:
                if os.path.isdir(dicom_dir):
                    shutil.rmtree(dicom_dir)
                os.replace(tmp_dicom, dicom_dir)
        except BaseException:
            # leave no partial outputs behind on failure
            if os.path.exists(tmp_npz):
                os.remove(tmp_npz)
            if tmp_dicom:
                shutil.rmtree(tmp_dicom, ignore_errors=True)
            raise
        logger.info("wrote %s", output_path)
        if dicom_dir:
            logger.info("wrote %d DICOM slices to %s", n_dcm, dicom_dir)

        return {
            "output": output_path,
            "shape": list(out_np.shape),
            "sampler": args.sampler,
            "steps": args.steps,
            "quant": args.quant,
            "quant_vae": args.quant_vae,
            "params": "ema" if use_ema else "raw",
            "seconds": round(dt, 3),
        }

    if cases is not None:
        import zlib

        logger.info("batch mode: %d cases from %s", len(cases), args.input_dir)
        os.makedirs(args.output_dir, exist_ok=True)
        base_key = jax.random.PRNGKey(args.seed)
        summaries, failures, consecutive = [], 0, 0
        for stem, path in cases:
            # per-case namespace so npz cache-window overrides don't leak
            # into the next case's output metadata
            case_args = argparse.Namespace(**vars(args))
            case_args.input = path
            # fold in a STABLE per-case value (crc32 of the stem), not the
            # loop index, so adding/removing a case never changes the other
            # cases' outputs for the same --seed
            case_key = jax.random.fold_in(
                base_key, zlib.crc32(stem.encode("utf-8"))
            )
            try:
                v_in, thickness = _load_input(case_args)
                logger.info("case %s: input volume %s", stem, v_in.shape)
                out_np, dt = _generate(v_in, case_key)
                dicom_dir = (
                    os.path.join(args.dicom_out, stem) if args.dicom_out else None
                )
                s = _write_case(
                    case_args, out_np, thickness,
                    os.path.join(args.output_dir, f"{stem}_thin.npz"),
                    dicom_dir, dt,
                )
                consecutive = 0
            except (Exception, SystemExit) as e:  # noqa: BLE001 — serving:
                # report, move on (_load_input raises SystemExit on bad cases)
                # (reference failure-report pattern,
                #  slice_interpolation_dataset.py:359-398)
                logger.error("case %s FAILED: %s", stem, e)
                s, failures = {"error": str(e)}, failures + 1
                consecutive += 1
                # infrastructure failures (TPU tunnel drop / XLA runtime
                # errors) hit EVERY remaining case — abort instead of
                # grinding each one through a slow failure
                mod = type(e).__module__ or ""
                if mod.startswith(("jaxlib", "jax._src")) or consecutive >= 3:
                    s["case"] = stem
                    print(json.dumps(s))
                    summaries.append(s)
                    raise SystemExit(
                        f"aborting batch after {failures} failures "
                        f"({consecutive} consecutive; last: {type(e).__name__}) "
                        "— likely a device/backend failure, see log above"
                    )
            s["case"] = stem
            print(json.dumps(s))
            summaries.append(s)
        secs = [s["seconds"] for s in summaries if "seconds" in s]
        if failures == len(summaries):
            raise SystemExit(f"all {failures} cases failed; see log above")
        agg = {
            "cases": len(summaries),
            "failed": failures,
            "total_seconds": round(sum(secs), 3),
            "first_seconds_incl_compile": secs[0] if secs else None,
            "steady_seconds_per_volume": (
                round(sum(secs[1:]) / (len(secs) - 1), 3) if len(secs) > 1 else None
            ),
            "output_dir": args.output_dir,
        }
        print(json.dumps(agg))
        if failures:
            # scripted callers must see a nonzero exit when ANY case failed
            # (the aggregate above still records the partial successes)
            raise SystemExit(1)
        return agg

    v_in, thickness = _load_input(args)
    logger.info("input volume: %s in [%.3f, %.3f]",
                v_in.shape, float(v_in.min()), float(v_in.max()))
    out_np, dt = _generate(v_in, jax.random.PRNGKey(args.seed))
    logger.info("generated %s in %.1f s (incl. compile on first run)",
                out_np.shape, dt)
    summary = _write_case(args, out_np, thickness, args.output, args.dicom_out, dt)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
