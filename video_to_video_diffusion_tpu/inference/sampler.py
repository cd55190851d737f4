"""DDPM / DDIM sampling and sliding-window stitching (TPU-native).

Rebuild of the reference samplers (inference/sampler.py:17-479) as jittable
`lax.scan` loops with static step counts — the whole DDIM trajectory compiles
to one XLA program instead of a Python loop of kernel launches.

The sliding-window stitching (reference :339-453) is restructured for TPU:
instead of sequentially sampling one patch at a time, the patch grid is
**batched** — `patch_batch` patches run through the UNet together (the MXU is
far from saturated at batch 1), and Gaussian-weighted accumulation happens
with dynamic-slice updates inside the same jit. Each patch is independent,
which also makes the grid the natural axis to shard across a device mesh
(see parallel/stitching.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_to_video_diffusion_tpu.models.diffusion import DiffusionSchedule

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (z, t) -> eps


# --------------------------------------------------------------------- DDIM
def ddim_timesteps(total_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Uniform-stride timestep subset, descending (reference sampler.py:221-239)."""
    step = total_timesteps // num_inference_steps
    ts = np.arange(0, total_timesteps, step)
    if ts[-1] != total_timesteps - 1:
        ts = np.append(ts, total_timesteps - 1)
    return ts[::-1].copy()


def ddim_sample(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    key: jax.Array,
    shape: Sequence[int],
    num_inference_steps: int = 20,
    eta: float = 0.0,
    init_scale: float = 1.0,
) -> jnp.ndarray:
    """DDIM sampling loop (reference sampler.py:242-336) as one lax.scan.

    Deterministic for eta=0 under a fixed key. Keeps the reference's
    numerical-stability choices: eps-stabilized square roots, z0 clamp to
    [-10, 10] (custom-VAE latents are not unit range), nan_to_num scrubbing.

    init_scale scales the starting noise z_T: 1.0 is standard sampling;
    0.0 starts the (eta=0, deterministic) trajectory at the prior MEAN —
    with an MSE-trained denoiser this reads out an approximation of the
    conditional mean in ONE trajectory instead of averaging K sampled
    trajectories (PSNR is minimized by the conditional mean, not by a
    posterior sample; see evaluate_full_volumes --avg-samples/--init-scale).
    """
    ts = ddim_timesteps(schedule.timesteps, num_inference_steps)
    alphas = np.asarray(schedule.alphas_cumprod)[ts]
    alphas_prev = np.append(alphas[1:], 1.0)  # next entry in descending list, else 1.0

    t_arr = jnp.asarray(ts, jnp.int32)
    a_arr = jnp.asarray(alphas, jnp.float32)
    ap_arr = jnp.asarray(alphas_prev, jnp.float32)

    k_init, k_loop = jax.random.split(key)
    z_init = init_scale * jax.random.normal(k_init, tuple(shape), jnp.float32)
    B = shape[0]

    def step(z, inp):
        t_idx, alpha_t, alpha_prev, k = inp
        t = jnp.full((B,), t_idx, jnp.int32)
        eps = jnp.nan_to_num(
            eps_fn(z, t).astype(jnp.float32), posinf=1.0, neginf=-1.0
        )
        return ddim_update(z, eps, alpha_t, alpha_prev, k, eta), None

    keys = jax.random.split(k_loop, len(ts))
    z_final, _ = jax.lax.scan(step, z_init, (t_arr, a_arr, ap_arr, keys))
    return z_final


def ddim_update(
    z: jnp.ndarray,
    eps: jnp.ndarray,
    alpha_t: jnp.ndarray,
    alpha_prev: jnp.ndarray,
    key: jax.Array,
    eta: float = 0.0,
) -> jnp.ndarray:
    """One DDIM z_t -> z_{t-1} update given a predicted eps (pure math).

    Shared by the sampling scan above and the aux-carrying variant below
    (static-quant calibration), so both follow the identical trajectory
    (reference sampler.py:284-320 update equations, incl. eps-stabilized
    roots and the z0 clamp)."""
    sqrt_a = jnp.sqrt(alpha_t + 1e-8)
    sqrt_1ma = jnp.sqrt(1.0 - alpha_t + 1e-8)
    z0 = (z - sqrt_1ma * eps) / (sqrt_a + 1e-8)
    z0 = jnp.clip(jnp.nan_to_num(z0, posinf=1.0, neginf=-1.0), -10.0, 10.0)
    sqrt_ap = jnp.sqrt(alpha_prev + 1e-8)
    dir_zt = jnp.sqrt(1.0 - alpha_prev + 1e-8) * eps
    if eta > 0:
        sigma = eta * jnp.sqrt(
            (1.0 - alpha_prev + 1e-8)
            / (1.0 - alpha_t + 1e-8)
            * (1.0 - alpha_t / (alpha_prev + 1e-8))
        )
        noise = jax.random.normal(key, z.shape, jnp.float32)
        z_next = sqrt_ap * z0 + dir_zt + sigma * noise
    else:
        z_next = sqrt_ap * z0 + dir_zt
    return jnp.nan_to_num(z_next, posinf=1.0, neginf=-1.0)


def ddim_sample_with_aux(
    eps_aux_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    schedule: DiffusionSchedule,
    key: jax.Array,
    shape: Sequence[int],
    num_inference_steps: int = 20,
    aux_init=None,
    eta: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DDIM scan threading an auxiliary carry through the eps function.

    `eps_aux_fn(aux, z, t) -> (eps, aux)` — used for static-quant
    calibration, where aux is the 'act_scales' collection each UNet quant
    site folds its abs-max into (models/model.observe_unet_act_scales). The
    trajectory is bit-identical to ddim_sample with the same key when
    eps_aux_fn's eps matches eps_fn (the observing pass computes outputs on
    the dynamic-quant path), so a calibration run doubles as a valid sample.

    Returns (z_final, aux_final).
    """
    ts = ddim_timesteps(schedule.timesteps, num_inference_steps)
    alphas = np.asarray(schedule.alphas_cumprod)[ts]
    alphas_prev = np.append(alphas[1:], 1.0)

    t_arr = jnp.asarray(ts, jnp.int32)
    a_arr = jnp.asarray(alphas, jnp.float32)
    ap_arr = jnp.asarray(alphas_prev, jnp.float32)

    k_init, k_loop = jax.random.split(key)
    z_init = jax.random.normal(k_init, tuple(shape), jnp.float32)
    B = shape[0]

    def step(carry, inp):
        z, aux = carry
        t_idx, alpha_t, alpha_prev, k = inp
        t = jnp.full((B,), t_idx, jnp.int32)
        eps_raw, aux = eps_aux_fn(aux, z, t)
        eps = jnp.nan_to_num(
            eps_raw.astype(jnp.float32), posinf=1.0, neginf=-1.0
        )
        return (ddim_update(z, eps, alpha_t, alpha_prev, k, eta), aux), None

    keys = jax.random.split(k_loop, len(ts))
    (z_final, aux_final), _ = jax.lax.scan(
        step, (z_init, aux_init), (t_arr, a_arr, ap_arr, keys)
    )
    return z_final, aux_final


# ---------------------------------------------------------------------- EDM
def edm_sigmas(
    schedule: DiffusionSchedule,
    num_inference_steps: int,
    rho: float = 7.0,
    sigma_max: float = 80.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Karras et al. 2022 sigma schedule, snapped to the trained VP grid.

    The trained discrete VP schedule induces a sigma table
    sigma_t = sqrt(1 - abar_t) / sqrt(abar_t) (the noise level of
    x_hat = z_t / sqrt(abar_t) = x0 + sigma_t * eps). We lay out
    `num_inference_steps` rho-spaced sigmas between min(sigma_max, table max)
    and the table's min and snap each to the nearest table entry, so the
    model is only ever queried at noise levels it was trained on and the
    discrete timestep conditioning is exact (no continuous-sigma mismatch).

    `sigma_max` caps the top of the grid at EDM's standard 80: the cosine
    schedule's table maximum is ~6e4 (abar_T ~ 3e-10), and anchoring the
    rho-grid there would spend most of the step budget above sigma ~ 900
    (pure noise) and collapse the snapped grid to a fraction of the
    requested steps; above sigma ~ 80 the denoiser's output is
    indistinguishable from its prior mean anyway. Pass float('inf') for the
    uncapped table range (linear schedules, whose max is ~157, are barely
    affected either way).

    Returns (sigmas (n,), t_indices (n,)) with sigmas descending; the
    terminal sigma=0 is NOT included (samplers append it). n can be slightly
    below num_inference_steps if adjacent grid points snap to the same table
    entry (only relevant for very short tables).
    """
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    sigma_table = np.sqrt((1.0 - abar) / abar)  # ascending in t
    s_min, s_max = sigma_table[0], min(float(sigma_max), sigma_table[-1])
    i = np.arange(num_inference_steps, dtype=np.float64)
    frac = i / max(num_inference_steps - 1, 1)
    sig = (
        s_max ** (1.0 / rho) + frac * (s_min ** (1.0 / rho) - s_max ** (1.0 / rho))
    ) ** rho
    t_idx = np.abs(sigma_table[None, :] - sig[:, None]).argmin(axis=1)
    t_idx = np.asarray(sorted(set(t_idx.tolist()), reverse=True), np.int64)
    return sigma_table[t_idx], t_idx


def edm_sample(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    key: jax.Array,
    shape: Sequence[int],
    num_inference_steps: int = 20,
    rho: float = 7.0,
    sigma_max: float = 80.0,
) -> jnp.ndarray:
    """EDM (Karras) deterministic Heun sampler over the probability-flow ODE.

    Goes beyond the reference, whose EDMSampler is a NotImplementedError stub
    (inference/sampler.py:482-493). Works on the standard eps-prediction
    model with no retraining: in the x_hat = z / sqrt(abar) parametrization
    the ODE is dx_hat/dsigma = eps_hat(x_hat, sigma), integrated with Heun's
    2nd-order method (two eps_fn calls per step, one on the final
    Euler-to-zero step). The model input is rescaled by
    c_in = sqrt(abar_t) = 1/sqrt(1 + sigma_t^2), and the denoised prediction
    is clamped to [-10, 10] each step like the DDIM path (custom-VAE latents
    are not unit range).

    Deterministic under a fixed key (noise enters only at initialization).
    """
    sigmas, t_idx = edm_sigmas(schedule, num_inference_steps, rho, sigma_max)
    n = len(sigmas)
    sig = jnp.asarray(np.append(sigmas, 0.0), jnp.float32)  # (n+1,) descending
    c_in = jnp.asarray(1.0 / np.sqrt(1.0 + sigmas ** 2), jnp.float32)
    t_arr = jnp.asarray(t_idx, jnp.int32)
    B = shape[0]

    def denoise(x, sigma, cin, t_scalar):
        t = jnp.full((B,), t_scalar, jnp.int32)
        eps = jnp.nan_to_num(
            eps_fn(x * cin, t).astype(jnp.float32), posinf=1.0, neginf=-1.0
        )
        d0 = jnp.clip(jnp.nan_to_num(x - sigma * eps), -10.0, 10.0)
        return (x - d0) / sigma  # ODE slope d x_hat / d sigma

    x_init = sig[0] * jax.random.normal(key, tuple(shape), jnp.float32)

    def heun_step(x, inp):
        i = inp
        sigma, sigma_next = sig[i], sig[i + 1]
        d = denoise(x, sigma, c_in[i], t_arr[i])
        x_euler = x + (sigma_next - sigma) * d
        d2 = denoise(x_euler, sigma_next, c_in[i + 1], t_arr[i + 1])
        x_next = x + (sigma_next - sigma) * 0.5 * (d + d2)
        return jnp.nan_to_num(x_next, posinf=1.0, neginf=-1.0), None

    if n > 1:
        x, _ = jax.lax.scan(heun_step, x_init, jnp.arange(n - 1, dtype=jnp.int32))
    else:
        x = x_init
    # final Euler step sigma_min -> 0: x(0) = clamped denoised prediction
    d_last = denoise(x, sig[n - 1], c_in[n - 1], t_arr[n - 1])
    x = x - sig[n - 1] * d_last
    return jnp.nan_to_num(x, posinf=1.0, neginf=-1.0)


# --------------------------------------------------------------------- DDPM
def ddpm_sample(
    eps_fn: EpsFn,
    schedule: DiffusionSchedule,
    key: jax.Array,
    shape: Sequence[int],
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Full-T ancestral DDPM sampling (reference models/diffusion.py:310-367)."""
    T = schedule.timesteps
    B = shape[0]
    k_init, k_loop = jax.random.split(key)
    z_init = jax.random.normal(k_init, tuple(shape), jnp.float32)

    def step(z, inp):
        t_idx, k = inp
        t = jnp.full((B,), t_idx, jnp.int32)
        eps = eps_fn(z, t).astype(jnp.float32)
        c0 = schedule.sqrt_alphas_cumprod[t_idx]
        c1 = schedule.sqrt_one_minus_alphas_cumprod[t_idx]
        z0 = (z - c1 * eps) / c0
        if clip_denoised:
            z0 = jnp.clip(z0, -1.0, 1.0)
        mean = (
            schedule.posterior_mean_coef1[t_idx] * z0
            + schedule.posterior_mean_coef2[t_idx] * z
        )
        log_var = schedule.posterior_log_variance_clipped[t_idx]
        noise = jax.random.normal(k, z.shape, jnp.float32)
        nonzero = (t_idx != 0).astype(jnp.float32)
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise, None

    t_arr = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(k_loop, T)
    z_final, _ = jax.lax.scan(step, z_init, (t_arr, keys))
    return z_final


def sampler_unet_evals(
    sampler: str, schedule: DiffusionSchedule, num_inference_steps: int
) -> int:
    """Number of UNet (eps_fn) evaluations a sampler performs.

    Used for FLOPs accounting: XLA's cost analysis counts a lax.scan body
    exactly once regardless of trip count, so total model FLOPs must be
    reconstructed as per-eval FLOPs x this count. Note 'ddim' with
    num_inference_steps=50 on a 1000-step schedule runs 51 evals (the subset
    is padded with T-1, ddim_timesteps above); 'edm' Heun runs 2 evals per
    scan step plus the final Euler step.
    """
    if sampler == "ddim":
        return len(ddim_timesteps(schedule.timesteps, num_inference_steps))
    if sampler == "edm":
        n = len(edm_sigmas(schedule, num_inference_steps)[0])
        return 2 * (n - 1) + 1 if n > 1 else 1
    if sampler == "ddpm":
        return schedule.timesteps
    raise ValueError(f"Unknown sampler {sampler!r}")


# ---------------------------------------------------------------- stitching
def gaussian_weight_3d(d: int, h: int, w: int) -> jnp.ndarray:
    """Separable 3D Gaussian blending weight, sigma=dim/6 (reference :455-479)."""

    def g(n):
        x = np.arange(n, dtype=np.float64) - (n - 1) / 2.0
        s = n / 6.0
        return np.exp(-(x ** 2) / (2.0 * s ** 2))

    weight = g(d)[:, None, None] * g(h)[None, :, None] * g(w)[None, None, :]
    return jnp.asarray(weight, jnp.float32)


def stitch_positions(full: int, patch: int, stride: int) -> list:
    """Dedup'd edge-snapped start positions (reference sampler.py:388-395)."""
    pos = list(range(0, full - patch + 1, stride)) + [max(0, full - patch)]
    return sorted(set(pos))


def sample_with_stitching(
    generate_patch_batch: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
    v_thick_full: jnp.ndarray,
    key: jax.Array,
    patch_size: Tuple[int, int, int] = (8, 192, 192),
    target_patch_size: Tuple[int, int, int] = (48, 192, 192),
    stride: Tuple[int, int, int] = (4, 96, 96),
    patch_batch: int = 8,
) -> jnp.ndarray:
    """Full-volume generation by Gaussian-blended sliding-window patches.

    Args:
      generate_patch_batch: (thick patches (N, pd, ph, pw, C), key) ->
        thin patches (N, td, ph, pw, C). Typically
        ``lambda v, k: model.generate(params, v, k, 'ddim', steps,
        target_depth=td)`` jitted once.
      v_thick_full: (1, D_thick, H, W, C) — single volume (the reference's
        production path is batch 1; patches become the batch axis here).
      patch_batch: patches sampled together per device step.

    Returns:
      (1, D_thick * td/pd, H, W, C) stitched thin volume.
    """
    assert v_thick_full.shape[0] == 1, "stitching expects a single volume"
    _, D_thick, H_full, W_full, C = v_thick_full.shape
    pd, ph, pw = patch_size
    td, th, tw = target_patch_size
    sd, sh, sw = stride
    depth_ratio = td // pd
    D_thin = D_thick * depth_ratio

    coords = [
        (d, h, w)
        for d in stitch_positions(D_thick, pd, sd)
        for h in stitch_positions(H_full, ph, sh)
        for w in stitch_positions(W_full, pw, sw)
    ]
    n = len(coords)
    n_pad = (-n) % patch_batch
    valid = np.ones(n + n_pad, np.float32)
    if n_pad:
        coords = coords + [coords[-1]] * n_pad
        valid[n:] = 0.0
    coords_arr = jnp.asarray(coords, jnp.int32).reshape(-1, patch_batch, 3)
    valid_arr = jnp.asarray(valid, jnp.float32).reshape(-1, patch_batch)
    num_chunks = coords_arr.shape[0]

    w_patch = gaussian_weight_3d(td, th, tw)[None, :, :, :, None]  # (1,td,th,tw,1)
    thick = v_thick_full[0]  # (D, H, W, C)

    acc = jnp.zeros((1, D_thin, H_full, W_full, C), jnp.float32)
    wmap = jnp.zeros((1, D_thin, H_full, W_full, C), jnp.float32)
    keys = jax.random.split(key, num_chunks)
    dims = (pd, ph, pw, td, th, tw, depth_ratio)
    for i in range(num_chunks):
        acc, wmap = _run_chunk(
            generate_patch_batch, dims, thick, w_patch,
            acc, wmap, coords_arr[i], valid_arr[i], keys[i],
        )
    return acc / (wmap + 1e-8)


@partial(jax.jit, static_argnums=(0, 1))
def _run_chunk(generate_patch_batch, dims, thick, w_patch, acc, wmap, chunk_coords, chunk_valid, k):
    """One batched patch-chunk: extract -> generate -> blend-accumulate.

    `generate_patch_batch` and the geometry tuple are static, so repeated
    stitching calls (e.g. per validation volume) share one compiled program.
    """
    pd, ph, pw, td, th, tw, depth_ratio = dims
    C = thick.shape[-1]
    patch_batch = chunk_coords.shape[0]

    def extract(coord):
        d, h, w = coord[0], coord[1], coord[2]
        return jax.lax.dynamic_slice(thick, (d, h, w, 0), (pd, ph, pw, C))

    patches = jax.vmap(extract)(chunk_coords)  # (pb, pd, ph, pw, C)
    thin = generate_patch_batch(patches, k)  # (pb, td, th, tw, C)
    weighted = thin.astype(jnp.float32) * w_patch

    def put(i, carry):
        acc, wmap = carry
        d, h, w = (
            chunk_coords[i, 0] * depth_ratio,
            chunk_coords[i, 1],
            chunk_coords[i, 2],
        )
        vw = chunk_valid[i]
        idx = (0, d, h, w, 0)
        w_i = jax.lax.dynamic_slice_in_dim(weighted, i, 1, axis=0)
        cur = jax.lax.dynamic_slice(acc, idx, (1, td, th, tw, C))
        acc = jax.lax.dynamic_update_slice(acc, cur + vw * w_i, idx)
        curw = jax.lax.dynamic_slice(wmap, idx, (1, td, th, tw, C))
        wmap = jax.lax.dynamic_update_slice(wmap, curw + vw * w_patch, idx)
        return acc, wmap

    return jax.lax.fori_loop(0, patch_batch, put, (acc, wmap))


# ------------------------------------------------------- class-style wrappers
class DDIMSampler:
    """API-parity wrapper over the functional DDIM core (reference :201-479)."""

    def __init__(self, schedule: DiffusionSchedule, eps_fn: EpsFn):
        self.schedule = schedule
        self.eps_fn = eps_fn
        self.timesteps = schedule.timesteps

    def sample(self, shape, conditioning_eps_fn: Optional[EpsFn] = None, *,
               num_inference_steps: int = 20, key: jax.Array, eta: float = 0.0):
        fn = conditioning_eps_fn or self.eps_fn
        return ddim_sample(fn, self.schedule, key, shape, num_inference_steps, eta)

    def sample_with_stitching(self, generate_patch_batch, v_thick_full, key, **kw):
        """Sliding-window full-volume variant (reference :339-453); takes the
        jitted per-patch-batch generator (encode->DDIM->decode)."""
        return sample_with_stitching(generate_patch_batch, v_thick_full, key, **kw)


class DDPMSampler:
    """API-parity wrapper over the functional DDPM core (reference :17-198)."""

    def __init__(self, schedule: DiffusionSchedule, eps_fn: EpsFn):
        self.schedule = schedule
        self.eps_fn = eps_fn
        self.timesteps = schedule.timesteps

    def sample(self, shape, conditioning_eps_fn: Optional[EpsFn] = None, *, key: jax.Array):
        fn = conditioning_eps_fn or self.eps_fn
        return ddpm_sample(fn, self.schedule, key, shape)

    def sample_with_stitching(self, generate_patch_batch, v_thick_full, key, **kw):
        """Sliding-window full-volume variant (reference :64-172)."""
        return sample_with_stitching(generate_patch_batch, v_thick_full, key, **kw)


class EDMSampler:
    """Karras-EDM Heun sampler — implemented here; the reference only ships a
    NotImplementedError stub (inference/sampler.py:482-493)."""

    def __init__(self, schedule: DiffusionSchedule, eps_fn: EpsFn):
        self.schedule = schedule
        self.eps_fn = eps_fn
        self.timesteps = schedule.timesteps

    def sample(self, shape, conditioning_eps_fn: Optional[EpsFn] = None, *,
               num_inference_steps: int = 20, key: jax.Array, rho: float = 7.0):
        fn = conditioning_eps_fn or self.eps_fn
        return edm_sample(fn, self.schedule, key, shape, num_inference_steps, rho)

    def sample_with_stitching(self, generate_patch_batch, v_thick_full, key, **kw):
        """Sliding-window full-volume variant (sampler-agnostic blending)."""
        return sample_with_stitching(generate_patch_batch, v_thick_full, key, **kw)
