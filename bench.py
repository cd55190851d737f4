"""Headline benchmark: full-volume 50-step DDIM generation + VAE decode.

Task (BASELINE.json): generate a 48x512x512 thin volume from an 8x512x512
thick volume with the medium model (latent 8, VAE base 128, UNet 128ch
[1,2,4,4]) via sliding-window patch DDIM + Gaussian-blended stitching.

Reference baseline (A100 80GB, published): ~30 s per 50-step DDIM patch
sample (README.md:475-479). The stitching grid for an 8x512x512 volume at
patch (8,192,192) / stride (4,96,96) is 1x5x5 = 25 patches (dedup'd,
edge-snapped — inference/sampler.py:388-395), so the full volume costs
25 x 30 s = 750 s sequentially on the reference implementation.

This benchmark runs the same grid on one TPU chip through the pipelined
stitcher (inference/pipeline.py): all 25 patches go through ONE batched DDIM
scan (bf16 UNet, f32 sampler math — batch 25 keeps the MXU fed), while the
HBM-bound VAE encode/decode run in chunks of 5. Measured v5e-1: ~55.7 s
steady vs 750 s reference (~13.5x, after the lane-aligned attention layout).

Env knobs:
  BENCH_STEPS   DDIM steps (default 50)
  BENCH_DC      encode/decode chunk size (default 5)
  BENCH_DC_ENC  encode-stage chunk size override (default 25 = the whole
                production grid in one dispatch; 0 = BENCH_DC).
                The encoder's thick-depth activations are 6x smaller than
                the decoder's, so it tolerates the whole grid in one
                dispatch (25) — fewer round-trips through the relay tunnel,
                whose per-dispatch latency dominates the measured encode
                stage.
  BENCH_DC_SAMPLE  sampling-stage chunk size (0/unset = whole grid in one
                scan). For grids larger than HBM allows (512^2 series).
  BENCH_SMALL   1 = tiny proxy config for quick CPU smoke runs
  BENCH_QUANT   sampling-scan precision. Default 'int8_static' (w8a8 UNet
                with calibrated per-site activation scales — the warmup
                run calibrates, the timed run skips the per-conv abs-max
                HBM passes; ops/quant.py). 'int8' = dynamic activation
                scales. 'bf16'/'none' = the trained-precision path. The
                JSON line records which ran in its "quant" field.
                Quality, measured on the trained diff_res4 checkpoint
                (paired full-volume DDIM-50, lambda=1, docs/RESULTS.md
                round 5): bf16 31.927 dB, int8 31.888 (-0.04),
                int8_static 31.852 (-0.075), int8_static+int8-VAE 31.822
                (-0.105) — ~0.1 dB for the full int8 path, far inside the
                recipe-to-recipe spread; speed 55.7 s (bf16) -> 43.1
                (int8) -> 40.1 (int8_static + int8 VAE + encode batch).
  BENCH_QUANT_VAE  decode-stage precision. Default 'int8' (w8a8 decoder,
                models/vae.py quant_int8; quality delta above);
                'none'/'bf16' = trained precision.
  BENCH_QUANT_ATTN 1 = run the attention matmuls (q@k^T, attn@v) on the
                int8 MXU path too (model.quant_attention_matmuls; only
                meaningful with BENCH_QUANT int8/int8_static).
  BENCH_RESIDUAL 1 = run the benchmark geometry through the residual-mode
                model (trilinear conditioning + residual decode) — the
                deployed configuration when the trained checkpoint is a
                residual model (VERDICT r3 #4).
  BENCH_PROFILE <dir> = capture a jax.profiler trace of one extra
                (untimed) run into <dir> for TensorBoard/Perfetto.
  BENCH_SAMPLER ddim (default) | ddpm | edm. ddpm ignores BENCH_STEPS
                (full-T ancestral loop) — the reference's third published
                inference row (~10 min/sample DDPM-1000, README.md:475-480).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_SECONDS_PER_PATCH_50STEP = 30.0  # README.md:475-479
GRID_PATCHES = 25  # 8x512x512 @ patch (8,192,192), stride (4,96,96)
BASELINE_FULL_VOLUME_S = A100_SECONDS_PER_PATCH_50STEP * GRID_PATCHES  # 750 s


def baseline_seconds(sampler: str, steps: int) -> float:
    """Published A100 per-sample time x the 25-patch grid, matched to the
    reference's three inference rows (README.md:475-480): DDIM-20 ~15 s,
    DDIM-50 ~30 s, DDPM-1000 ~10 min. Other DDIM step counts scale linearly
    from the 50-step row."""
    if sampler == "ddpm":
        per_patch = 600.0
    elif steps == 20:
        per_patch = 15.0
    else:
        per_patch = A100_SECONDS_PER_PATCH_50STEP * steps / 50.0
    return per_patch * GRID_PATCHES


def main() -> None:
    small = os.environ.get("BENCH_SMALL") == "1"
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    vae_batch = int(os.environ.get("BENCH_DC", "5"))
    encode_batch = int(os.environ.get("BENCH_DC_ENC", "25")) or None
    sample_batch = int(os.environ.get("BENCH_DC_SAMPLE", "0")) or None
    quant = os.environ.get("BENCH_QUANT", "int8_static").lower()
    if quant in ("", "none", "bf16", "fp", "off"):
        quant = None
    quant_vae = os.environ.get("BENCH_QUANT_VAE", "int8").lower()
    if quant_vae in ("", "none", "bf16", "fp", "off"):
        quant_vae = None
    sampler = os.environ.get("BENCH_SAMPLER", "ddim").lower()
    from video_to_video_diffusion_tpu.utils.platform import (
        configure_platform,
        enable_compilation_cache,
    )

    if small:
        configure_platform("cpu")
    enable_compilation_cache()

    from video_to_video_diffusion_tpu.config import load_config
    from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
    from video_to_video_diffusion_tpu.inference.pipeline import generate_volume
    from video_to_video_diffusion_tpu.data.synthetic import synthetic_patient_pair
    from video_to_video_diffusion_tpu.data.windowing import (
        apply_ct_windowing,
        to_model_range,
    )

    if small:
        cfg = load_config("tiny_test")
        vol_hw, patch_hw, stride_hw = 64, 32, 16
        pd_thick, pd_thin = 4, 8
        d_thick = 4
        steps = min(steps, 5)
        vae_batch = min(vae_batch, 8)
    else:
        cfg = load_config("slice_interpolation_full_medium")
        vol_hw, patch_hw, stride_hw = 512, 192, 96
        pd_thick, pd_thin = 8, 48
        d_thick = 8

    cfg_d = cfg.to_dict()
    if os.environ.get("BENCH_QUANT_ATTN") == "1":
        cfg_d["model"]["quant_attention_matmuls"] = True
    residual = os.environ.get("BENCH_RESIDUAL") == "1"
    if residual:
        cfg_d["model"]["residual_mode"] = True
    cfg = load_config(cfg_d)

    model = VideoToVideoDiffusion(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, patch_shape=(pd_thick, patch_hw, patch_hw), batch=1)

    # synthetic thick volume, windowed to [-1, 1] (thick = thin/5 block means,
    # so generate 5*d_thick thin slices)
    thick_hu, _ = synthetic_patient_pair(
        0, thin_depth=d_thick * 5, height=vol_hw, width=vol_hw
    )
    v_thick = to_model_range(apply_ct_windowing(thick_hu))[None, ..., None]
    v_thick = jnp.asarray(v_thick[:, :d_thick])

    def run(key):
        out = generate_volume(
            model,
            params,
            v_thick,
            key,
            num_inference_steps=steps,
            patch_size=(pd_thick, patch_hw, patch_hw),
            target_patch_size=(pd_thin, patch_hw, patch_hw),
            stride=(max(pd_thick // 2, 1), stride_hw, stride_hw),
            vae_batch=vae_batch,
            quant=quant,
            quant_vae=quant_vae,
            sampler=sampler,
            encode_batch=encode_batch,
            sample_batch=sample_batch,
        )
        # force full materialization on the host (block_until_ready does not
        # reliably sync through relay-backed TPU backends)
        _ = float(out.ravel()[0])
        return out

    # warmup (compile)
    t0 = time.time()
    out = run(jax.random.PRNGKey(1))
    warm = time.time() - t0
    assert np.isfinite(np.asarray(out)).all(), "non-finite benchmark output"

    if quant == "int8_static":
        # the first int8_static call ran the calibration (dynamic-scale)
        # scan; one more warmup compiles + caches the static-scale scan so
        # the timed run measures steady-state static-quant execution
        t0 = time.time()
        out = run(jax.random.PRNGKey(1))
        warm += time.time() - t0
        assert np.isfinite(np.asarray(out)).all(), "non-finite static-quant output"

    t0 = time.time()
    out = run(jax.random.PRNGKey(2))
    elapsed = time.time() - t0

    # BENCH_PROFILE=<dir>: capture a jax.profiler trace of one EXTRA run
    # (after the timed run, so tracing overhead never touches the headline).
    # View in TensorBoard / Perfetto; utils/profiler.py wraps the API.
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        from video_to_video_diffusion_tpu.utils.profiler import trace_context

        with trace_context(profile_dir):
            run(jax.random.PRNGKey(3))
        print(f"# profiler trace written to {profile_dir}", file=sys.stderr)

    # Per-stage wall times from ONE extra instrumented run (per-stage syncs
    # serialize the dispatch pipeline, so the headline `elapsed` above stays
    # un-instrumented). Used for the per-stage achieved-TFLOP/s breakdown.
    stage_times: dict = {}
    try:
        generate_volume(
            model, params, v_thick, jax.random.PRNGKey(2),
            num_inference_steps=steps,
            patch_size=(pd_thick, patch_hw, patch_hw),
            target_patch_size=(pd_thin, patch_hw, patch_hw),
            stride=(max(pd_thick // 2, 1), stride_hw, stride_hw),
            vae_batch=vae_batch, quant=quant, quant_vae=quant_vae,
            sampler=sampler, stage_times=stage_times,
            encode_batch=encode_batch, sample_batch=sample_batch,
        )
    except Exception as e:  # noqa: BLE001 — breakdown is best-effort
        print(f"# stage breakdown unavailable: {e}", file=sys.stderr)
        stage_times = {}

    # Achieved FLOP/s + MFU via the analytic conv/dot model-FLOP count
    # (ops/flops.py; XLA cost analysis measured ~9x low on the UNet —
    # VERDICT r1 item 5). v5e peaks: 197 TFLOP/s bf16, 394 TOP/s int8.
    tflops = mfu = int8_util = None
    stage_tflops: dict = {}
    try:
        from video_to_video_diffusion_tpu.inference.pipeline import (
            generate_volume_flops,
        )

        flops = generate_volume_flops(
            model, params, tuple(v_thick.shape),
            num_inference_steps=steps,
            patch_size=(pd_thick, patch_hw, patch_hw),
            target_patch_size=(pd_thin, patch_hw, patch_hw),
            stride=(max(pd_thick // 2, 1), stride_hw, stride_hw),
            vae_batch=vae_batch, sampler=sampler,
        )
        tflops = flops["total"] / elapsed / 1e12
        on_tpu = jax.devices()[0].platform == "tpu"
        peak_bf16 = 197.0 if on_tpu else None
        mfu = tflops / peak_bf16 if peak_bf16 else None
        for st in ("encode", "sample", "decode"):
            if stage_times.get(st):
                stage_tflops[st] = flops[st] / stage_times[st] / 1e12
        # int8 runs execute the sampling-scan convs on the 394 TOP/s int8 MXU
        # path, so "MFU vs the bf16 peak" can exceed what bf16 could reach —
        # report the sample stage's utilization of the int8 peak separately
        # so the headline cannot be misread (VERDICT r2 weak #3).
        if quant and on_tpu and stage_tflops.get("sample"):
            int8_util = stage_tflops["sample"] / 394.0
        print(
            f"# flops: sample={flops['sample']/1e12:.2f}T "
            f"encode={flops['encode']/1e12:.2f}T decode={flops['decode']/1e12:.2f}T "
            f"total={flops['total']/1e12:.2f}T achieved={tflops:.1f} TFLOP/s"
            + (f" MFU={mfu*100:.1f}% of 197 TFLOP/s v5e bf16 peak" if mfu else ""),
            file=sys.stderr,
        )
        if stage_times:
            print(
                "# stage breakdown (instrumented run): "
                + " ".join(
                    f"{st}={stage_times.get(st, 0.0):.2f}s"
                    + (f"/{stage_tflops[st]:.1f}TFLOP/s" if st in stage_tflops else "")
                    for st in ("encode", "sample", "decode", "blend")
                ),
                file=sys.stderr,
            )
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)

    result = {
        "metric": (
            "48x512x512 volume gen time "
            + ("(DDPM-1000 + decode)" if sampler == "ddpm"
               else f"({steps}-step {sampler.upper()} + decode)")
        )
        if not small
        else "tiny proxy volume gen time",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(baseline_seconds(sampler, steps) / elapsed, 3)
        if not small
        else 0.0,
    }
    if tflops is not None:
        result["achieved_tflops"] = round(tflops, 2)
    if mfu is not None:
        # Explicitly-named denominators (VERDICT r2 weak #3): mfu_bf16_peak
        # is bf16-equivalent achieved FLOP/s over the 197 TFLOP/s bf16 peak
        # (int8 runs can exceed what pure bf16 could reach — that's the int8
        # MXU path, not >100% bf16 efficiency); util_vs_int8_peak is the
        # sampling stage's achieved rate over the 394 TOP/s int8 peak.
        result["mfu_bf16_peak"] = round(mfu, 4)
    if int8_util is not None:
        result["util_vs_int8_peak"] = round(int8_util, 4)
    if stage_tflops:
        result["stage_tflops"] = {k: round(v, 1) for k, v in stage_tflops.items()}
        result["stage_seconds"] = {
            k: round(v, 2) for k, v in stage_times.items()
        }
    if sampler != "ddim":
        result["sampler"] = sampler
    result["steps"] = steps if sampler != "ddpm" else 1000
    if quant:
        result["quant"] = quant
    if quant_vae:
        result["quant_vae"] = quant_vae
    if os.environ.get("BENCH_QUANT_ATTN") == "1":
        result["quant_attn"] = True
    if residual:
        result["residual_mode"] = True
    print(json.dumps(result))
    print(
        f"# shape={tuple(out.shape)} steps={steps} vae_batch={vae_batch} "
        f"warmup(incl. compile)={warm:.1f}s device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
