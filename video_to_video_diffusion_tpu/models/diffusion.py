"""Gaussian diffusion process: schedules, forward process, training loss.

Functional rebuild of the reference's `GaussianDiffusion` torch module
(models/diffusion.py:16-383): all precomputed schedule arrays live in an
immutable `DiffusionSchedule` pytree of jnp constants; q_sample / loss /
posterior math are pure jittable functions with explicit PRNG keys. The
variable-depth masked loss (reference models/diffusion.py:174-192, a Python
per-sample loop) is rewritten as a vectorized masked mean — identical values,
one fused XLA reduction.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Precomputed diffusion constants (all shape (T,), f32).

    Mirrors the reference's registered buffers (models/diffusion.py:42-64).
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def timesteps(self) -> int:
        return int(self.betas.shape[0])


def linear_betas(timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    """Linear schedule (reference models/diffusion.py:66-68)."""
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_betas(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule of Nichol & Dhariwal 2021 (reference :70-79)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0001, 0.9999)


def make_schedule(
    noise_schedule: str = "cosine",
    timesteps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
) -> DiffusionSchedule:
    """Build all precomputed constants (host-side numpy, f64 -> f32)."""
    if noise_schedule == "linear":
        betas = linear_betas(timesteps, beta_start, beta_end)
    elif noise_schedule == "cosine":
        betas = cosine_betas(timesteps)
    else:
        raise ValueError(f"Unknown noise schedule: {noise_schedule}")

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(np.maximum(posterior_variance, 1e-20))
    posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_mean_coef2 = (
        (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
    )

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(posterior_mean_coef1),
        posterior_mean_coef2=f32(posterior_mean_coef2),
    )


def _extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape to (B, 1, 1, ...).

    Reference models/diffusion.py:369-383.
    """
    out = a[t].astype(jnp.float32)
    return out.reshape(t.shape[0], *((1,) * (ndim - 1)))


def q_sample(
    schedule: DiffusionSchedule,
    z0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward process: z_t = sqrt(a-bar_t) z0 + sqrt(1-a-bar_t) eps.

    Reference models/diffusion.py:81-106. Noise must be provided (explicit
    PRNG discipline).
    """
    c0 = _extract(schedule.sqrt_alphas_cumprod, t, z0.ndim)
    c1 = _extract(schedule.sqrt_one_minus_alphas_cumprod, t, z0.ndim)
    return (c0 * z0.astype(jnp.float32) + c1 * noise.astype(jnp.float32)).astype(
        z0.dtype
    )


def predict_z0_from_noise(
    schedule: DiffusionSchedule,
    z_t: jnp.ndarray,
    t: jnp.ndarray,
    noise_pred: jnp.ndarray,
) -> jnp.ndarray:
    """z0 = (z_t - sqrt(1-a-bar) eps) / sqrt(a-bar). Reference :249-268."""
    c0 = _extract(schedule.sqrt_alphas_cumprod, t, z_t.ndim)
    c1 = _extract(schedule.sqrt_one_minus_alphas_cumprod, t, z_t.ndim)
    return ((z_t.astype(jnp.float32) - c1 * noise_pred.astype(jnp.float32)) / c0).astype(
        z_t.dtype
    )


PREDICTION_TYPES = ("epsilon", "v", "x0")


def prediction_target(
    schedule: DiffusionSchedule,
    prediction_type: str,
    z0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Training target for the given parametrization.

    The reference trains epsilon-prediction only (models/diffusion.py:135-142);
    'v' (Salimans & Ho 2022, v = sqrt(abar) eps - sqrt(1-abar) x0) and 'x0'
    are TPU-side additions — for strongly-conditioned near-deterministic
    tasks like slice interpolation they force the network to predict signal
    at high noise levels, where eps-prediction carries no gradient toward
    the conditioning.
    """
    if prediction_type == "epsilon":
        return noise
    c0 = _extract(schedule.sqrt_alphas_cumprod, t, z0.ndim)
    c1 = _extract(schedule.sqrt_one_minus_alphas_cumprod, t, z0.ndim)
    if prediction_type == "v":
        return (
            c0 * noise.astype(jnp.float32) - c1 * z0.astype(jnp.float32)
        ).astype(z0.dtype)
    if prediction_type == "x0":
        return z0
    raise ValueError(f"Unknown prediction_type {prediction_type!r}; expected one of {PREDICTION_TYPES}")


def to_epsilon(
    schedule: DiffusionSchedule,
    prediction_type: str,
    z_t: jnp.ndarray,
    t: jnp.ndarray,
    pred: jnp.ndarray,
) -> jnp.ndarray:
    """Convert a network output in any parametrization to an eps estimate.

    Lets every sampler keep its eps-based update equations (the DDIM update's
    z0-from-eps reconstruction is exact under this conversion): for 'v',
    eps = sqrt(1-abar) z_t + sqrt(abar) v; for 'x0',
    eps = (z_t - sqrt(abar) x0) / sqrt(1-abar) (stabilized like the
    reference's roots, sampler.py:284-320).
    """
    if prediction_type == "epsilon":
        return pred
    c0 = _extract(schedule.sqrt_alphas_cumprod, t, z_t.ndim)
    c1 = _extract(schedule.sqrt_one_minus_alphas_cumprod, t, z_t.ndim)
    z = z_t.astype(jnp.float32)
    p = pred.astype(jnp.float32)
    if prediction_type == "v":
        return (c1 * z + c0 * p).astype(pred.dtype)
    if prediction_type == "x0":
        return ((z - c0 * p) / (c1 + 1e-8)).astype(pred.dtype)
    raise ValueError(f"Unknown prediction_type {prediction_type!r}; expected one of {PREDICTION_TYPES}")


def predict_z0_from_pred(
    schedule: DiffusionSchedule,
    prediction_type: str,
    z_t: jnp.ndarray,
    t: jnp.ndarray,
    pred: jnp.ndarray,
) -> jnp.ndarray:
    """z0 estimate from a network output in any parametrization."""
    if prediction_type == "epsilon":
        return predict_z0_from_noise(schedule, z_t, t, pred)
    if prediction_type == "x0":
        return pred
    if prediction_type == "v":
        c0 = _extract(schedule.sqrt_alphas_cumprod, t, z_t.ndim)
        c1 = _extract(schedule.sqrt_one_minus_alphas_cumprod, t, z_t.ndim)
        return (
            c0 * z_t.astype(jnp.float32) - c1 * pred.astype(jnp.float32)
        ).astype(z_t.dtype)
    raise ValueError(f"Unknown prediction_type {prediction_type!r}; expected one of {PREDICTION_TYPES}")


def posterior_mean_variance(
    schedule: DiffusionSchedule,
    z0_pred: jnp.ndarray,
    z_t: jnp.ndarray,
    t: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """q(z_{t-1} | z_t, z0) mean / variance / log-variance. Reference :270-308."""
    ndim = z_t.ndim
    coef1 = _extract(schedule.posterior_mean_coef1, t, ndim)
    coef2 = _extract(schedule.posterior_mean_coef2, t, ndim)
    mean = coef1 * z0_pred.astype(jnp.float32) + coef2 * z_t.astype(jnp.float32)
    variance = _extract(schedule.posterior_variance, t, ndim)
    log_variance = _extract(schedule.posterior_log_variance_clipped, t, ndim)
    return mean, variance, log_variance


def min_snr_weight(
    schedule: DiffusionSchedule,
    t: jnp.ndarray,
    gamma: float = 5.0,
    prediction_type: str = "epsilon",
) -> jnp.ndarray:
    """Min-SNR-gamma loss weight (reference models/diffusion.py:144-149).

    snr = a-bar/(1-a-bar); weight = min(snr, gamma)/snr — down-weights easy
    low-noise timesteps so per-timestep loss variance is balanced.

    Parametrization forms (x0-space equivalent weight in brackets):
      epsilon  min(snr, g)/snr        [min(snr, g)]  — reference behavior
      x0       min(snr, g)            [min(snr, g)]  — Hang et al. 2023 §3.3
      v        min(snr+1, g)/(snr+1)  [min(snr+1, g)]

    The v form deliberately does NOT use Hang et al.'s strict equivalence
    (min(snr,g)/(snr+1)): that weight vanishes as snr -> 0, i.e. the model
    receives ZERO gradient at the highest-noise timesteps — exactly where a
    DDIM trajectory builds global structure from the conditioning. The
    snr+1 form is the Min-SNR cap applied to v-prediction's natural uniform
    v-MSE (Salimans & Ho 2022; x0-weight snr+1), keeping weight 1 at pure
    noise while still capping easy low-noise steps at gamma.
    """
    abar = schedule.alphas_cumprod[t]
    snr = abar / (1.0 - abar + 1e-8)
    if prediction_type == "epsilon":
        return jnp.clip(snr, max=gamma) / (snr + 1e-8)
    if prediction_type == "v":
        return jnp.clip(snr + 1.0, max=gamma) / (snr + 1.0)
    if prediction_type == "x0":
        return jnp.clip(snr, max=gamma)
    raise ValueError(f"Unknown prediction_type {prediction_type!r}; expected one of {PREDICTION_TYPES}")


def diffusion_training_loss(
    schedule: DiffusionSchedule,
    eps_pred: jnp.ndarray,
    eps_true: jnp.ndarray,
    t: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    snr_gamma: float = 5.0,
    prediction_type: str = "epsilon",
) -> Tuple[jnp.ndarray, dict]:
    """Min-SNR-weighted prediction-MSE loss (epsilon by default).

    For prediction_type='v'/'x0', pass the matching (pred, target) pair from
    prediction_target(); the Min-SNR-gamma weight takes the matching form
    (see min_snr_weight): eps -> min(snr,g)/snr, x0 -> min(snr,g) (both
    x0-equivalent to Hang et al. 2023), v -> min(snr+1,g)/(snr+1) (the
    Min-SNR cap on v-prediction's natural uniform v-MSE, which keeps
    nonzero gradient at the highest-noise timesteps).

    Mirrors the three reference paths (models/diffusion.py:152-199):
      * mask=None: per-sample mean MSE, SNR-weighted, batch mean.
      * mask given, all samples equal valid count (patch mode): global masked
        mean then mean of per-sample SNR weights — numerically identical to
        the reference's `(loss * snr_weight).mean()`.
      * mask given, variable valid counts (full-volume mode): per-sample
        masked mean * per-sample weight, batch mean — the reference's Python
        loop (:174-192), vectorized.
    The variable-count formula generalizes the equal-count one only up to the
    reference's own algebra; we reproduce the reference exactly by computing
    both and selecting with `lax.cond`-free arithmetic (a where on a scalar).

    Args:
      eps_pred/eps_true: (B, ...) same shape.
      t: (B,) int timesteps.
      mask: optional broadcastable-to-eps mask with 1=real, 0=padding. The
        reference passes (B, C, T) masks against NCDHW tensors; here pass a
        mask already broadcastable against the NDHWC value shape.
    Returns:
      (scalar loss f32, metrics dict of scalars)
    """
    B = eps_pred.shape[0]
    diff = (eps_pred.astype(jnp.float32) - eps_true.astype(jnp.float32)) ** 2
    w = min_snr_weight(schedule, t, snr_gamma, prediction_type)  # (B,)

    if mask is None:
        per_sample = diff.reshape(B, -1).mean(axis=1)
        loss = (per_sample * w).mean()
    else:
        m = jnp.broadcast_to(mask.astype(jnp.float32), diff.shape)
        masked = diff * m
        valid_per_sample = m.reshape(B, -1).sum(axis=1)  # (B,)
        all_same = jnp.all(valid_per_sample == valid_per_sample[0])
        # Equal-count path (reference :169-173)
        loss_equal = (masked.sum() / jnp.maximum(m.sum(), 1.0)) * w.mean()
        # Variable-count path (reference :174-192)
        per_sample = masked.reshape(B, -1).sum(axis=1) / jnp.maximum(
            valid_per_sample, 1.0
        )
        per_sample = jnp.where(valid_per_sample > 0, per_sample * w, 0.0)
        loss_var = per_sample.mean()
        loss = jnp.where(all_same, loss_equal, loss_var)

    metrics = {"mse": loss, "total": loss}
    return loss, metrics


def sample_timesteps(key: jax.Array, batch: int, timesteps: int) -> jnp.ndarray:
    """Uniform random timesteps (reference models/diffusion.py:133)."""
    return jax.random.randint(key, (batch,), 0, timesteps, dtype=jnp.int32)
