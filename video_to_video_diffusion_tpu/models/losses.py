"""Auxiliary losses (differentiable JAX): SSIM / MS-SSIM, autoencoder loss.

Rebuild of the reference aux losses (models/losses.py:149-361 MS-SSIM,
training/train_vae.py:42-169 AutoencoderLoss). Notes on divergences:

  * The reference's VGG19 perceptual loss (models/losses.py:22-146) and
    LPIPS (train_vae.py:76-96) depend on torchvision/lpips pretrained CNNs
    that cannot sit on the JAX/TPU training path; default configs ship with
    both disabled (config/slice_interpolation_full_medium.yaml:153-158), and
    here they are likewise off — the SSIM family below is the supported
    differentiable perceptual term.
  * Every-N-step gating (reference train_vae.py:141-153, losses.py:343-357)
    is implemented with `lax.cond` on the step counter so it stays jittable.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from video_to_video_diffusion_tpu.utils.metrics import avg_pool2d as _avg_pool_shared

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _avg_pool(x: jnp.ndarray, k: int, stride: int, pad: int) -> jnp.ndarray:
    return _avg_pool_shared(x, k, stride=stride, pad=pad)


def _ssim_components(
    x: jnp.ndarray, y: jnp.ndarray, window: int, max_val: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(luminance*cs map, cs map) for (B, H, W, C) inputs."""
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    p = window // 2
    mu1 = _avg_pool(x, window, 1, p)
    mu2 = _avg_pool(y, window, 1, p)
    s1 = jnp.maximum(_avg_pool(x * x, window, 1, p) - mu1 * mu1, 0.0)
    s2 = jnp.maximum(_avg_pool(y * y, window, 1, p) - mu2 * mu2, 0.0)
    s12 = _avg_pool(x * y, window, 1, p) - mu1 * mu2
    lum = (2 * mu1 * mu2 + C1) / (mu1 * mu1 + mu2 * mu2 + C1)
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    return lum * cs, cs


def ssim_2d(x: jnp.ndarray, y: jnp.ndarray, window: int = 11, max_val: float = 1.0) -> jnp.ndarray:
    """Differentiable scalar SSIM for (B, H, W, C)."""
    full, _ = _ssim_components(x.astype(jnp.float32), y.astype(jnp.float32), window, max_val)
    return full.mean()


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    window: int = 11,
    max_val: float = 1.0,
    weights: Sequence[float] = _MSSSIM_WEIGHTS,
) -> jnp.ndarray:
    """Multi-scale SSIM for (B, H, W, C) (reference models/losses.py:149-278).

    cs terms from the coarse-to-fine pyramid are combined with the standard
    exponent weights. When H or W is too small for the full 5-level pyramid
    (needs min(H, W) >= window * 2**(levels-1)), the pyramid is truncated to
    the deepest feasible level and the exponent weights renormalized to sum
    to 1 — pytorch_msssim would assert instead; truncation keeps tiny test
    configs usable without changing the production (192^2) behavior.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    levels = len(weights)
    min_hw = min(x.shape[1], x.shape[2])
    while levels > 1 and min_hw // (2 ** (levels - 1)) < window:
        levels -= 1
    if levels < len(weights):
        w = list(weights[:levels])
        s = sum(w)
        weights = [wi / s for wi in w]
    vals = []
    for i in range(levels):
        full, cs = _ssim_components(x, y, window, max_val)
        if i == levels - 1:
            vals.append(jnp.clip(full.mean(), 1e-6, 1.0))
        else:
            vals.append(jnp.clip(cs.mean(), 1e-6, 1.0))
            x = _avg_pool(x, 2, 2, 0)
            y = _avg_pool(y, 2, 2, 0)
    out = jnp.prod(
        jnp.stack([v ** w for v, w in zip(vals, weights)])
    )
    return out


def ms_ssim_video(
    x: jnp.ndarray, y: jnp.ndarray, max_val: float = 1.0, **kw
) -> jnp.ndarray:
    """Per-slice MS-SSIM on (B, D, H, W, C), depth folded into batch."""
    B, D, H, W, C = x.shape
    return ms_ssim(x.reshape(B * D, H, W, C), y.reshape(B * D, H, W, C), max_val=max_val, **kw)


class AutoencoderLoss:
    """VAE reconstruction loss: MSE + optional mid-slice SSIM/perceptual terms.

    Reference training/train_vae.py:42-169: MSE always; SSIM-loss and LPIPS
    on the middle slice gated every N steps; everything reduced in f32. The
    TPU-side perceptual term substitutes the VGG19 feature-L1 of
    models/perceptual.py for LPIPS (same backbone family; LPIPS's learned
    per-layer linear weights are the documented delta) — pass a constructed
    VGGPerceptualLoss as `perceptual`.
    """

    def __init__(
        self,
        use_ssim: bool = False,
        ssim_weight: float = 0.1,
        every_n_steps: int = 1,
        max_val_range: float = 2.0,  # data lives in [-1, 1]
        perceptual=None,
        perceptual_weight: float = 0.0,
        perceptual_every_n_steps: int = 10,
    ):
        self.use_ssim = use_ssim
        self.ssim_weight = float(ssim_weight)
        self.every_n = max(int(every_n_steps), 1)
        self.max_val = float(max_val_range)
        self.perceptual = perceptual
        self.perceptual_weight = float(perceptual_weight)
        self.perc_every_n = max(int(perceptual_every_n_steps), 1)

    def __call__(
        self, recon: jnp.ndarray, target: jnp.ndarray, step: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        recon32 = recon.astype(jnp.float32)
        target32 = target.astype(jnp.float32)
        mse = jnp.mean((recon32 - target32) ** 2)
        total = mse
        aux: Dict[str, jnp.ndarray] = {"mse": mse}
        if self.use_ssim and self.ssim_weight > 0:
            D = recon.shape[1]
            mid_r = recon32[:, D // 2]
            mid_t = target32[:, D // 2]

            def with_ssim(_):
                return 1.0 - ssim_2d(mid_r, mid_t, max_val=self.max_val)

            gate = (step % self.every_n) == 0
            ssim_l = lax.cond(gate, with_ssim, lambda _: jnp.float32(0.0), None)
            total = total + self.ssim_weight * ssim_l
            aux["ssim_loss"] = ssim_l
        if self.perceptual is not None and self.perceptual_weight > 0:
            # middle-slice perceptual term, gated (reference
            # train_vae.py:76-96,141-148)
            def with_perc(_):
                return jnp.float32(
                    self.perceptual.middle_slice_loss(recon32, target32)
                )

            gate_p = (step % self.perc_every_n) == 0
            perc_l = lax.cond(gate_p, with_perc, lambda _: jnp.float32(0.0), None)
            total = total + self.perceptual_weight * perc_l
            aux["perceptual_loss"] = perc_l
        aux["total"] = total
        return total, aux


class CombinedLoss:
    """Weighted diffusion + aux loss combinator (reference models/losses.py:279-361).

    On gated steps the MS-SSIM term follows the reference's convex
    combination (models/diffusion.py:233-236):
    total = (1-λ)·diffusion + λ·(1-MS-SSIM); the VGG perceptual term is
    additive like the reference CombinedLoss (models/losses.py:345-348:
    total += λp·perceptual). Ungated steps keep the plain diffusion
    objective at full scale (the every-N gating of reference
    models/losses.py:343-357). Pass a constructed
    models.perceptual.VGGPerceptualLoss to enable the perceptual term
    (weights must be converted offline — scripts/convert_vgg_weights.py).

    Divergence, deliberate: the reference decodes the predicted z₀ under
    ``torch.no_grad()`` (models/diffusion.py:212-214), which detaches the
    MS-SSIM term from the graph — as written upstream it contributes zero
    gradient. Here the decode is differentiable (the caller freezes the VAE
    weights themselves via stop_gradient / optimizer masking), so λ>0
    actually shapes the UNet update.
    """

    def __init__(
        self,
        lambda_ssim: float = 0.0,
        ssim_every_n_steps: int = 10,
        perceptual=None,
        lambda_perceptual: float = 0.0,
        perceptual_every_n_steps: int = 10,
    ):
        self.lambda_ssim = float(lambda_ssim)
        self.every_n = max(int(ssim_every_n_steps), 1)
        self.perceptual = perceptual
        self.lambda_perceptual = float(lambda_perceptual)
        self.perc_every_n = max(int(perceptual_every_n_steps), 1)

    def __call__(
        self,
        diffusion_loss: jnp.ndarray,
        step: jnp.ndarray,
        decoded_pred: Optional[jnp.ndarray] = None,
        decoded_target: Optional[jnp.ndarray] = None,
        decoded_fn=None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """decoded_fn: nullary () -> (pred, target) volumes in [-1, 1];
        evaluated inside the gate branch so the (expensive) VAE decode is
        skipped entirely on ungated steps. Alternatively pass the decoded
        arrays directly via decoded_pred/decoded_target."""
        aux = {"diffusion": diffusion_loss}
        total = diffusion_loss
        have_decoded = decoded_fn is not None or decoded_pred is not None
        use_ssim = self.lambda_ssim > 0
        use_perc = self.perceptual is not None and self.lambda_perceptual > 0
        if have_decoded and (use_ssim or use_perc):
            false = jnp.asarray(False)
            gate_s = ((step % self.every_n) == 0) if use_ssim else false
            gate_p = ((step % self.perc_every_n) == 0) if use_perc else false

            def with_aux(_):
                # one decode shared by both terms; value-gated below, so a
                # step where only one gate fires still pays both reductions
                # (cheap next to the decode) but weights the other at 0
                if decoded_fn is not None:
                    pred, target = decoded_fn()
                else:
                    pred, target = decoded_pred, decoded_target
                ssim_l = (
                    1.0 - ms_ssim_video(
                        (pred.astype(jnp.float32) + 1.0) / 2.0,
                        (target.astype(jnp.float32) + 1.0) / 2.0,
                        max_val=1.0,
                    )
                    if use_ssim else jnp.float32(0.0)
                )
                perc_l = (
                    self.perceptual(pred, target) if use_perc else jnp.float32(0.0)
                )
                return jnp.float32(ssim_l), jnp.float32(perc_l)

            ssim_l, perc_l = lax.cond(
                jnp.logical_or(gate_s, gate_p), with_aux,
                lambda _: (jnp.float32(0.0), jnp.float32(0.0)), None,
            )
            lam_s = jnp.where(gate_s, jnp.float32(self.lambda_ssim), 0.0)
            lam_p = jnp.where(gate_p, jnp.float32(self.lambda_perceptual), 0.0)
            total = (1.0 - lam_s) * diffusion_loss + lam_s * ssim_l + lam_p * perc_l
            if use_ssim:
                aux["ms_ssim_loss"] = ssim_l
            if use_perc:
                aux["perceptual_loss"] = perc_l
        aux["total"] = total
        return total, aux
