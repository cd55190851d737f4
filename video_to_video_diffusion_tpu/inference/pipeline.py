"""Pipelined full-volume generation.

`sample_with_stitching` fuses extract -> generate -> accumulate into one XLA
program per chunk; correct, but the fused program's compile time grows with
everything it contains (20+ min for the production config through a remote
compiler). This module runs the same math as five small, independently
compiled stages, each at its own optimal batch size:

  1. extract: all patch crops (vmapped dynamic_slice)
  2. encode:  thick patches -> conditioning latents (chunked; activations
              at 192^2 are HBM-heavy)
  3. sample:  one DDIM scan over the WHOLE patch grid (latents are tiny —
              the big batch is what keeps the MXU fed: measured 2.3 s/patch
              at batch 25 vs 3.3 s/patch at batch 5 on v5e)
  4. decode:  latents -> thin patches (chunked like encode)
  5. blend:   Gaussian-weighted scatter-add + normalize

Stage compiles are shared process-wide (and across processes via the
persistent compilation cache).
"""

from __future__ import annotations

import time as _time
from collections import OrderedDict
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_to_video_diffusion_tpu.models.diffusion import to_epsilon
from video_to_video_diffusion_tpu.inference.sampler import (
    ddim_sample,
    ddim_sample_with_aux,
    ddpm_sample,
    edm_sample,
    gaussian_weight_3d,
    sampler_unet_evals,
    stitch_positions,
)

_SAMPLERS = ("ddim", "ddpm", "edm")
_QUANT_MODES = (None, "int8", "int8_static")
_QUANT_VAE_MODES = (None, "int8")


def _is_concrete(tree) -> bool:
    return not any(
        isinstance(leaf, jax.core.Tracer)
        for leaf in jax.tree_util.tree_leaves(tree)
    )


def _quantized_tree(model, params):
    """The params dict with the UNet subtree int8-quantized, memoized.

    Quantization runs ONCE per (model, params tree) — an N-sample eval loop
    (or a timed bench run) pays the whole-tree abs-max/round/scale pass and
    its HBM copy a single time, not per generate call. The cache entry holds
    a strong reference to the source tree so its id() cannot be recycled
    while the memo is live."""
    ck = ("quantized_tree", id(model), id(params))
    if ck in _STAGE_CACHE:
        return _STAGE_CACHE[ck][1]
    quantizer = _cached(
        "quantize", (id(model),), lambda: jax.jit(model.quantize_unet_params)
    )
    qp = dict(params)
    qp.update(quantizer(params))
    if _is_concrete(qp):
        _STAGE_CACHE[ck] = (params, qp)
    # else: inside an outer trace (e.g. the sharded stitcher's chunk
    # runner) even a concrete-arg inner jit is staged out, so the
    # quantized leaves are tracers — memoizing them would leak out of
    # the trace. Recomputing per trace is fine: quantization stays
    # outside the sampling scan, which still carries int8 weights.
    return qp


def _decode_params_and_apply(model, params, quant_vae):
    """Resolve the (params, decode) pair for the decode stage.

    quant_vae=None keeps the trained tree + compute-dtype decoder;
    quant_vae='int8' quantizes the decoder's res-block/upsample convs ONCE
    per (model, params tree) — memoized like the UNet tree — and decodes on
    the w8a8 path (dynamic activation scales; decode runs once per volume,
    so there is no scan to amortize a calibration pass over)."""
    if quant_vae is None:
        return params, model.decode
    if quant_vae == "int8":
        ck = ("quantized_vae_tree", id(model), id(params))
        if ck in _STAGE_CACHE:
            return _STAGE_CACHE[ck][1], model.decode_q
        quantizer = _cached(
            "quantize_vae", (id(model),),
            lambda: jax.jit(model.quantize_vae_decoder_params),
        )
        qp = dict(params)
        qp.update(quantizer(params))
        if _is_concrete(qp):
            _STAGE_CACHE[ck] = (params, qp)
        # else: staged out inside an outer trace (see _quantized_tree).
        return qp, model.decode_q
    raise ValueError(
        f"Unknown quant_vae mode {quant_vae!r}; expected one of {_QUANT_VAE_MODES}"
    )


def _sample_params_and_apply(model, params, quant):
    """Resolve the (params, unet-apply) pair for a sampling stage.

    quant=None keeps the trained tree + compute-dtype UNet; quant='int8'
    runs the w8a8 UNet with per-call dynamic activation scales;
    quant='int8_static' additionally reads calibrated per-site activation
    abs-max values from the memoized 'act_scales' collection — if none are
    calibrated yet the returned params LACK the 'act_scales' key and the
    sample stage runs a calibration trajectory instead (_sample_stage)."""
    if quant is None:
        return params, model.apply_unet
    if quant == "int8":
        return _quantized_tree(model, params), model.apply_unet_q
    if quant == "int8_static":
        qp = _quantized_tree(model, params)
        sk = ("act_scales", id(model), id(params))
        if sk in _STAGE_CACHE:
            qp = dict(qp)
            qp["act_scales"] = _STAGE_CACHE[sk][1]
            return qp, model.apply_unet_q_static
        return qp, None  # needs calibration
    raise ValueError(f"Unknown quant mode {quant!r}; expected one of {_QUANT_MODES}")


def _route_sampler(sampler: str, eps, schedule, key, shape, steps, eta,
                   init_scale: float = 1.0):
    """One sampler dispatch for both pipelined paths. DDPM ignores `steps`
    (full-T ancestral loop) and `eta`; unknown names raise instead of
    silently falling through to DDIM."""
    if sampler == "ddim":
        return ddim_sample(eps, schedule, key, shape, steps, eta,
                           init_scale=init_scale)
    if init_scale != 1.0:
        raise ValueError(
            "init_scale is a DDIM-only knob (the deterministic-mean readout "
            f"needs an eta=0 ODE trajectory); got sampler={sampler!r}"
        )
    if sampler == "edm":
        return edm_sample(eps, schedule, key, shape, steps)
    if sampler == "ddpm":
        return ddpm_sample(eps, schedule, key, shape)
    raise ValueError(f"Unknown sampler {sampler!r}; expected one of {_SAMPLERS}")


def _calibration_sample(model, src_params, sample_params, z_in, key, steps, eta):
    """One DDIM trajectory on the dynamic-int8 path that records per-site
    activation abs-max values ('act_scales') as it goes.

    The observing pass computes exactly what the dynamic path computes
    (layers.observe_or_read_amax falls back to dynamic quantization while
    mutable), so the returned z0 is a valid sample — the calibration call
    costs nothing extra beyond the scale bookkeeping. The calibrated
    collection is memoized per (model, params) so every later
    quant='int8_static' call skips the per-conv abs-max HBM reductions."""
    scales0 = _cached("act_scales_zeros", (id(model),), model.init_unet_act_scales)

    def _calib(p, s, z_c, k):
        def eps_aux(aux, z, t):
            out, aux = model.observe_unet_act_scales(p, aux, z, t, z_c)
            return to_epsilon(model.schedule, model.prediction_type, z, t, out), aux

        return ddim_sample_with_aux(
            eps_aux, model.schedule, k, (*z_c.shape[:-1], model.latent_dim), steps, s, eta
        )

    calib = _cached(
        "calib", (id(model), steps, eta) + tuple(z_in.shape),
        lambda: jax.jit(_calib),
    )
    z0, scales = calib(sample_params, scales0, z_in, key)
    if _is_concrete(scales):
        _STAGE_CACHE[("act_scales", id(model), id(src_params))] = (src_params, scales)
    # else: traced (e.g. inside the sharded stitcher's chunk jit) — the run
    # is still a correct dynamic-int8 sample; calibrate eagerly first to get
    # the static fast path there.
    return z0


def _sample_stage(model, params, z_in, key, sampler, num_inference_steps, eta, quant,
                  init_scale: float = 1.0):
    """The sampling stage shared by staged_generate and generate_volume:
    (conditioning latents, key) -> clamped z0, one cached jitted scan per
    (model, sampler, steps, eta, quant, init_scale, latent shape)."""
    sample_params, apply_unet = _sample_params_and_apply(model, params, quant)
    if quant == "int8_static" and apply_unet is None:
        if init_scale != 1.0:
            raise ValueError(
                "int8_static calibration runs a standard (init_scale=1) DDIM "
                "trajectory; calibrate first with init_scale=1, then rerun"
            )
        if sampler != "ddim":
            raise ValueError(
                "quant='int8_static' needs calibrated activation scales; the "
                "calibration pass is implemented on the 'ddim' sampler. Run "
                "one ddim generate with quant='int8_static' first (it "
                "calibrates and memoizes the scales), or use quant='int8'."
            )
        z0 = _calibration_sample(
            model, params, sample_params, z_in, key, num_inference_steps, eta
        )
        return jnp.clip(jnp.nan_to_num(z0, posinf=1.0, neginf=-1.0), -10.0, 10.0)

    def _sample(p, z_c, k):
        def eps(z, t):
            out = apply_unet(p, z, t, z_c).astype(jnp.float32)
            return to_epsilon(model.schedule, model.prediction_type, z, t, out)

        # sampled latents have latent_dim channels on the conditioning grid
        # (residual-mode conditioning carries f^2*C channels instead)
        shape = (*z_c.shape[:-1], model.latent_dim)
        return _route_sampler(
            sampler, eps, model.schedule, k, shape, num_inference_steps, eta,
            init_scale,
        )

    sample = _cached(
        sampler,
        (id(model), num_inference_steps, eta, quant, init_scale)
        + tuple(z_in.shape),
        lambda: jax.jit(_sample),
    )
    z0 = sample(sample_params, z_in, key)
    return jnp.clip(jnp.nan_to_num(z0, posinf=1.0, neginf=-1.0), -10.0, 10.0)
from video_to_video_diffusion_tpu.ops.resize import resize_trilinear, space_to_depth

# Entry kinds derived from a SPECIFIC parameter tree (vs. shape-keyed stage
# jits): these hold strong references to multi-GB trees.
_PARAM_KINDS = ("quantized_tree", "quantized_vae_tree", "act_scales")
_PARAM_TREES_MAX = 2  # distinct param trees whose derived entries stay cached


class _StageCache(dict):
    """Stage-jit + derived-tree cache with an LRU bound on param-tree entries.

    Jitted stage programs are keyed by (model id, shapes) — a small set
    reused for the process lifetime. Entries derived from a specific
    parameter tree (int8 trees, calibrated act scales; _PARAM_KINDS above)
    pin whole multi-GB trees, so only the _PARAM_TREES_MAX most-recently-used
    trees keep their derived entries (VERDICT r2: an N-checkpoint eval loop
    must not pin every quantized tree). The strong reference held by a live
    entry doubles as the id()-stability pin for its id(params) cache-key
    component; an evicted tree is simply re-derived on next use.
    """

    def __init__(self):
        super().__init__()
        self._lru: "OrderedDict[int, set]" = OrderedDict()  # id(params) -> keys

    def _touch(self, key, create: bool) -> None:
        if not (isinstance(key, tuple) and key and key[0] in _PARAM_KINDS):
            return
        pid = key[2]
        if pid in self._lru:
            self._lru.move_to_end(pid)
        elif create:
            self._lru[pid] = set()
            while len(self._lru) > _PARAM_TREES_MAX:
                _, keys = self._lru.popitem(last=False)
                for k in keys:
                    super().pop(k, None)
        if create and pid in self._lru:
            self._lru[pid].add(key)

    def __getitem__(self, key):
        value = super().__getitem__(key)
        self._touch(key, create=False)
        return value

    def __setitem__(self, key, value):
        self._touch(key, create=True)
        super().__setitem__(key, value)

    def pop(self, key, *default):
        if isinstance(key, tuple) and key and key[0] in _PARAM_KINDS:
            pid = key[2]
            if pid in self._lru:
                self._lru[pid].discard(key)
                if not self._lru[pid]:
                    del self._lru[pid]
        return super().pop(key, *default)


_STAGE_CACHE = _StageCache()


def _cached(name, key, builder):
    k = (name,) + key
    if k not in _STAGE_CACHE:
        _STAGE_CACHE[k] = builder()
    return _STAGE_CACHE[k]


@partial(jax.jit, static_argnums=(2,))
def _extract_patches(thick: jnp.ndarray, coords: jnp.ndarray, dims) -> jnp.ndarray:
    pd, ph, pw, C = dims

    def one(c):
        return jax.lax.dynamic_slice(thick, (c[0], c[1], c[2], 0), (pd, ph, pw, C))

    return jax.vmap(one)(coords)


@partial(jax.jit, static_argnums=(4,))
def _blend(acc, wmap, patches, coords, dims):
    """Gaussian-weighted scatter-add of (N, td, th, tw, C) patches."""
    td, th, tw, C, depth_ratio = dims
    w_patch = gaussian_weight_3d(td, th, tw)[None, :, :, :, None]
    weighted = patches.astype(jnp.float32) * w_patch

    def put(i, carry):
        acc, wmap = carry
        d = coords[i, 0] * depth_ratio
        h = coords[i, 1]
        w = coords[i, 2]
        idx = (0, d, h, w, 0)
        w_i = jax.lax.dynamic_slice_in_dim(weighted, i, 1, axis=0)
        cur = jax.lax.dynamic_slice(acc, idx, (1, td, th, tw, C))
        acc = jax.lax.dynamic_update_slice(acc, cur + w_i, idx)
        curw = jax.lax.dynamic_slice(wmap, idx, (1, td, th, tw, C))
        wmap = jax.lax.dynamic_update_slice(wmap, curw + w_patch, idx)
        return acc, wmap

    return jax.lax.fori_loop(0, patches.shape[0], put, (acc, wmap))


def staged_generate(
    model,
    params,
    v_in: jnp.ndarray,
    key: jax.Array,
    num_inference_steps: int = 20,
    target_depth: Optional[int] = None,
    eta: float = 0.0,
    sampler: str = "ddim",
    quant: Optional[str] = None,
    quant_vae: Optional[str] = None,
    init_scale: float = 1.0,
) -> jnp.ndarray:
    """generate() semantics through three independently compiled stages.

    Same math as model.generate (encode -> DDIM -> decode, NaN scrubs, z0
    clamp) but each stage is its own cached jit — one fused generate program
    takes tens of minutes to compile through a remote compiler, while the
    stages compile in minutes once and are shared with generate_volume.
    quant='int8'/'int8_static' runs the sampling scan on the w8a8 UNet
    (ops/quant.py); quant_vae='int8' additionally decodes on the w8a8
    decoder (encode always stays at the trained precision).
    """
    cond_up = None
    if getattr(model, "residual_mode", False):
        # residual conditioning is pure pixel math (no params): trilinear
        # upsample + space-to-depth fold, one cached jit per input shape
        D_t = target_depth or v_in.shape[1]
        cond = _cached(
            "cond", (id(model), D_t) + tuple(v_in.shape),
            lambda: jax.jit(
                lambda v: (
                    lambda cu: (cu, space_to_depth(cu, model.spatial_factor))
                )(model.cond_pixels(jnp.nan_to_num(v.astype(jnp.float32)), D_t))
            ),
        )
        cond_up, z_in = cond(v_in)
    else:
        enc = _cached(
            "encode", (id(model),) + tuple(v_in.shape[1:]) + (v_in.shape[0],),
            lambda: jax.jit(lambda p, v: model.encode(p, v).astype(jnp.float32)),
        )
        z_in = jnp.nan_to_num(enc(params, v_in), posinf=1.0, neginf=-1.0)
        if target_depth is not None and target_depth != z_in.shape[1]:
            z_in = resize_trilinear(z_in, (target_depth, z_in.shape[2], z_in.shape[3]))

    z0 = _sample_stage(
        model, params, z_in, key, sampler, num_inference_steps, eta, quant,
        init_scale,
    )

    dec_params, decode = _decode_params_and_apply(model, params, quant_vae)
    if cond_up is not None:
        dec = _cached(
            "decode_res", (id(model), quant_vae, z0.shape[0]) + tuple(z0.shape[1:]),
            lambda: jax.jit(
                lambda p, z, cu: model.compose_residual(
                    cu, decode(p, z).astype(jnp.float32)
                )
            ),
        )
        out = dec(dec_params, z0, cond_up)
    else:
        dec = _cached(
            "decode", (id(model), quant_vae, z0.shape[0]) + tuple(z0.shape[1:]),
            lambda: jax.jit(lambda p, z: decode(p, z).astype(jnp.float32)),
        )
        out = dec(dec_params, z0)
    return jnp.nan_to_num(out, posinf=1.0, neginf=-1.0)


def pad_depth_to_bucket(
    v: jnp.ndarray, bucket: int
) -> Tuple[jnp.ndarray, int]:
    """Edge-replicate-pad (B, D, H, W, C) along depth to a multiple of `bucket`.

    Every distinct input depth is a distinct stitch grid and therefore a
    distinct set of stage-jit shapes — minutes of compile each through a
    remote-TPU tunnel on real variable-depth series (VERDICT r2 weak #5).
    Padding to a small set of bucketed depths caps the number of compiled
    programs; callers trim the generated output back to
    original_depth * depth_ratio. Returns (padded, original_depth).
    """
    D = int(v.shape[1])
    Dp = -(-D // bucket) * bucket
    if Dp == D:
        return v, D
    pad = [(0, 0)] * v.ndim
    pad[1] = (0, Dp - D)
    return jnp.pad(v, pad, mode="edge"), D


def generate_volume(
    model,
    params,
    v_thick_full: jnp.ndarray,
    key: jax.Array,
    num_inference_steps: int = 50,
    patch_size: Tuple[int, int, int] = (8, 192, 192),
    target_patch_size: Tuple[int, int, int] = (48, 192, 192),
    stride: Tuple[int, int, int] = (4, 96, 96),
    vae_batch: int = 5,
    eta: float = 0.0,
    sampler: str = "ddim",
    quant: Optional[str] = None,
    quant_vae: Optional[str] = None,
    stage_times: Optional[dict] = None,
    depth_bucket: Optional[int] = None,
    init_scale: float = 1.0,
    encode_batch: Optional[int] = None,
    sample_batch: Optional[int] = None,
) -> jnp.ndarray:
    """Full thick->thin volume generation, pipelined.

    Args:
      v_thick_full: (1, D_thick, H, W, C) in [-1, 1].
      vae_batch: encode/decode chunk size (HBM bound at full resolution).
      encode_batch: encode-stage chunk size override (default: vae_batch).
        The encoder's activations are 6x smaller than the decoder's (thick
        depth vs thin), so it tolerates much larger chunks — fewer dispatch
        round-trips through a relay-backed TPU tunnel, where per-call
        latency, not compute, dominates the measured encode stage
        (BENCH_r04: 11.4 s for 90 TFLOP ~ 4% MFU).
      sample_batch: sampling-stage chunk size (default: the whole patch
        grid in one scan — maximal MXU batch). Large grids (a 512^2 CT
        series is 50+ patches) can exceed HBM at the batched scan's
        activation peak; chunking trades a little batch efficiency for a
        bounded footprint. Each chunk folds its index into the PRNG key.
      quant: None (trained precision), 'int8' (w8a8 UNet scan, dynamic
        per-call activation scales; ops/quant.py), or 'int8_static' (w8a8
        with calibrated per-site activation scales — the first ddim call
        runs a scale-observing dynamic trajectory and memoizes the scales;
        later calls skip the per-conv abs-max HBM reduction passes).
      quant_vae: None (trained precision) or 'int8' — decode the final
        latents on the w8a8 decoder (models/vae.VideoDecoder.quant_int8);
        the encode stage always stays at the trained precision.
      stage_times: optional dict; when given, each stage is followed by a
        forced device sync (one-element host readback — block_until_ready
        is unreliable through relay-backed TPU tunnels) and its wall time
        is recorded under 'encode'/'sample'/'decode'/'blend'. The syncs
        serialize the dispatch pipeline, so only pass this on
        instrumentation runs (bench.py per-stage breakdown), never on the
        timed headline run.

      depth_bucket: when set, edge-pad the thick depth to the next multiple
        (pad_depth_to_bucket) so variable-depth patients share compiled
        stage programs; the output is trimmed back to the true thin depth.

    Returns (1, D_thick * ratio, H, W, C) f32.
    """
    assert v_thick_full.shape[0] == 1
    d_orig = int(v_thick_full.shape[1])
    if depth_bucket:
        v_thick_full, d_orig = pad_depth_to_bucket(v_thick_full, depth_bucket)
    _, D_thick, H_full, W_full, C = v_thick_full.shape
    pd, ph, pw = patch_size
    td, th, tw = target_patch_size
    sd, sh, sw = stride
    ratio = td // pd
    D_thin = D_thick * ratio

    eb = encode_batch or vae_batch
    coords_list = [
        (d, h, w)
        for d in stitch_positions(D_thick, pd, sd)
        for h in stitch_positions(H_full, ph, sh)
        for w in stitch_positions(W_full, pw, sw)
    ]
    N = len(coords_list)
    # pad N to a multiple of vae_batch by repeating the last coord; padded
    # outputs are dropped before blending so weights stay exact.
    n_pad = (-N) % vae_batch
    coords = jnp.asarray(coords_list + [coords_list[-1]] * n_pad, jnp.int32)
    Np = N + n_pad

    patches = _extract_patches(v_thick_full[0], coords, (pd, ph, pw, C))

    def _mark(name, x, t0):
        if stage_times is not None:
            float(jax.device_get(x.ravel()[0]))  # force materialization
            stage_times[name] = stage_times.get(name, 0.0) + (_time.time() - t0)
        return _time.time()

    t0 = _time.time()

    # ---- encode (chunked) ----
    residual = getattr(model, "residual_mode", False)
    if residual:
        # pixel-space conditioning: per-patch trilinear upsample to the thin
        # grid + space-to-depth fold, chunked by vae_batch like the encode
        # path it replaces — jitting over ALL Np patches at once put
        # Np*td*ph*pw f32 resize intermediates in HBM at the same time
        # (multi-GB on large CT series; ADVICE r3). The upsampled pixels are
        # NOT kept across the sample stage: the decode stage recomputes them
        # per chunk (a trilinear resize is ~free next to the VAE decoder).
        cond = _cached(
            "cond_vol", (id(model), eb, pd, ph, pw, C, td),
            lambda: jax.jit(
                lambda v: space_to_depth(
                    model.cond_pixels(jnp.nan_to_num(v.astype(jnp.float32)), td),
                    model.spatial_factor,
                )
            ),
        )
        z_chunks = [cond(patches[i : i + eb]) for i in range(0, Np, eb)]
        z_in = jnp.concatenate(z_chunks, axis=0)
    else:
        enc = _cached(
            "encode", (id(model), eb, pd, ph, pw, C),
            lambda: jax.jit(lambda p, v: model.encode(p, v).astype(jnp.float32)),
        )
        z_chunks = [
            enc(params, patches[i : i + eb]) for i in range(0, Np, eb)
        ]
        z_in = jnp.concatenate(z_chunks, axis=0)
        z_in = jnp.nan_to_num(z_in, posinf=1.0, neginf=-1.0)
        if ratio != 1:
            z_in = resize_trilinear(z_in, (z_in.shape[1] * ratio, z_in.shape[2], z_in.shape[3]))
    t0 = _mark("encode", z_in, t0)

    # ---- batched DDIM (or EDM Heun) scan over the whole grid ----
    sb = sample_batch or Np
    if sb >= Np:
        z0 = _sample_stage(
            model, params, z_in, key, sampler, num_inference_steps, eta, quant,
            init_scale,
        )
    else:
        z0 = jnp.concatenate(
            [
                _sample_stage(
                    model, params, z_in[i : i + sb], jax.random.fold_in(key, i),
                    sampler, num_inference_steps, eta, quant, init_scale,
                )
                for i in range(0, Np, sb)
            ],
            axis=0,
        )
    t0 = _mark("sample", z0, t0)

    # ---- decode (chunked) ----
    dec_params, decode = _decode_params_and_apply(model, params, quant_vae)
    if residual:
        # cond_up is recomputed from the thick patches inside the decode jit
        # (fused with the decoder) instead of pinned in HBM across the whole
        # sample stage — see the cond stage comment above.
        dec = _cached(
            "decode_res_from_thick",
            (id(model), quant_vae, vae_batch, td) + tuple(z0.shape[1:]),
            lambda: jax.jit(
                lambda p, z, v: model.compose_residual(
                    model.cond_pixels(jnp.nan_to_num(v.astype(jnp.float32)), td),
                    decode(p, z).astype(jnp.float32),
                )
            ),
        )
        thin_chunks = [
            dec(dec_params, z0[i : i + vae_batch], patches[i : i + vae_batch])
            for i in range(0, Np, vae_batch)
        ]
    else:
        dec = _cached(
            "decode", (id(model), quant_vae, vae_batch) + tuple(z0.shape[1:]),
            lambda: jax.jit(lambda p, z: decode(p, z).astype(jnp.float32)),
        )
        thin_chunks = [
            dec(dec_params, z0[i : i + vae_batch]) for i in range(0, Np, vae_batch)
        ]
    thin = jnp.concatenate(thin_chunks, axis=0)[:N]
    thin = jnp.nan_to_num(thin, posinf=1.0, neginf=-1.0)
    t0 = _mark("decode", thin, t0)

    # ---- blend ----
    acc = jnp.zeros((1, D_thin, H_full, W_full, C), jnp.float32)
    wmap = jnp.zeros((1, D_thin, H_full, W_full, C), jnp.float32)
    acc, wmap = _blend(acc, wmap, thin, coords[:N], (td, th, tw, C, ratio))
    out = acc / (wmap + 1e-8)
    if depth_bucket and d_orig * ratio != D_thin:
        out = out[:, : d_orig * ratio]
    _mark("blend", out, t0)
    return out


def _cost_flops(jitted, *args) -> float:
    """Model FLOPs of one invocation (analytic jaxpr count, ops/flops.py).

    XLA's `compiled.cost_analysis()['flops']` was measured ~9x low on the
    UNet forward on the TPU backend — it reports the post-optimization
    executable's count, not model FLOPs — so MFU uses the closed-form
    conv/dot count instead (docs/RESULTS.md, MFU section).
    """
    from video_to_video_diffusion_tpu.ops.flops import count_flops

    return count_flops(jitted, *args)


def generate_volume_flops(
    model,
    params,
    volume_shape: Tuple[int, ...],
    num_inference_steps: int = 50,
    patch_size: Tuple[int, int, int] = (8, 192, 192),
    target_patch_size: Tuple[int, int, int] = (48, 192, 192),
    stride: Tuple[int, int, int] = (4, 96, 96),
    vae_batch: int = 5,
    eta: float = 0.0,
    sampler: str = "ddim",
) -> dict:
    """Total model FLOPs of a generate_volume call with these arguments.

    Reuses the SAME cached encode/decode stage jits as generate_volume
    (identical cache keys). Returns {'sample', 'encode', 'decode', 'total'}
    FLOPs, where 'sample' = per-eval UNet FLOPs x the sampler's UNet eval
    count. FLOPs are the analytic conv/dot counts (ops/flops.py), not XLA
    cost analysis — see _cost_flops.
    """
    _, D_thick, H_full, W_full, C = volume_shape
    pd, ph, pw = patch_size
    td, th, tw = target_patch_size
    sd, sh, sw = stride
    ratio = td // pd
    N = len(stitch_positions(D_thick, pd, sd)) * len(
        stitch_positions(H_full, ph, sh)
    ) * len(stitch_positions(W_full, pw, sw))
    Np = N + ((-N) % vae_batch)
    n_chunks = Np // vae_batch

    enc = _cached(
        "encode", (id(model), vae_batch, pd, ph, pw, C),
        lambda: jax.jit(lambda p, v: model.encode(p, v).astype(jnp.float32)),
    )
    patch = jnp.zeros((vae_batch, pd, ph, pw, C), jnp.float32)
    enc_flops = _cost_flops(enc, params, patch)

    f = model.spatial_factor
    z_shape = (Np, pd * ratio, ph // f, pw // f, model.latent_dim)

    # The sample stage is per-eval UNet FLOPs x the sampler's eval count
    # (cheaper than tracing the whole sampling scan, and exactly equivalent:
    # sampler arithmetic outside the UNet is a few elementwise ops on the
    # tiny latents — excluded by the model-FLOPs MFU numerator convention).
    unet_fwd = jax.jit(
        lambda p, z, t, c: model.apply_unet(p, z, t, c).astype(jnp.float32)
    )
    z0 = jnp.zeros(z_shape, jnp.float32)
    t0 = jnp.zeros((Np,), jnp.int32)
    unet_flops = _cost_flops(unet_fwd, params, z0, t0, z0)
    sample_flops = unet_flops * sampler_unet_evals(
        sampler, model.schedule, num_inference_steps
    )

    dec = _cached(
        "decode", (id(model), None, vae_batch) + tuple(z_shape[1:]),
        lambda: jax.jit(lambda p, z: model.decode(p, z).astype(jnp.float32)),
    )
    dec_flops = _cost_flops(
        dec, params, jnp.zeros((vae_batch,) + tuple(z_shape[1:]), jnp.float32)
    )

    return {
        "sample": sample_flops,
        "encode": enc_flops * n_chunks,
        "decode": dec_flops * n_chunks,
        "total": sample_flops + (enc_flops + dec_flops) * n_chunks,
    }
