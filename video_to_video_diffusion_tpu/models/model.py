"""Composite video-to-video latent diffusion model.

Functional rebuild of the reference `VideoToVideoDiffusion` torch module
(models/model.py:15-420). Because JAX separates code from state, this class
holds the *modules* (Flax defs) and the *schedule*, while parameters travel
as an explicit pytree {'vae': ..., 'unet': ...}. All methods are pure and
jittable given (params, inputs, key).

Training forward (reference model.py:158-228): VAE-encode both volumes with
stop_gradient (the reference encodes under no_grad), trilinearly upsample the
conditioning latent when depths differ (full-volume mode), then the
Min-SNR-weighted epsilon-MSE diffusion loss.

Generation (reference model.py:230-343): encode conditioning in f32, optional
depth upsample to `target_depth`, DDIM/DDPM latent sampling, VAE decode —
with nan_to_num scrubbing at stage boundaries like the reference's NaN
checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from video_to_video_diffusion_tpu.config import Config, load_config
from video_to_video_diffusion_tpu.models.diffusion import (
    PREDICTION_TYPES,
    DiffusionSchedule,
    diffusion_training_loss,
    make_schedule,
    prediction_target,
    q_sample,
    sample_timesteps,
    to_epsilon,
)
from video_to_video_diffusion_tpu.models.unet3d import UNet3D
from video_to_video_diffusion_tpu.models.vae import SliceInterpolationVAE
from video_to_video_diffusion_tpu.ops.precision import Policy
from video_to_video_diffusion_tpu.ops.resize import (
    resize_nearest,
    resize_trilinear,
    space_to_depth,
)


class VideoToVideoDiffusion:
    """VAE + UNet + diffusion process wired per the reference composite."""

    def __init__(self, config, policy: Optional[Policy] = None):
        self.config: Config = load_config(config)
        m = self.config.model
        self.policy = policy or Policy.from_precision(
            self.config.training.precision
            if self.config.training.mixed_precision
            else "f32"
        )
        use_ckpt = self.config.hardware.gradient_checkpointing

        def _make(dtype):
            vae = SliceInterpolationVAE(
                in_channels=m.in_channels,
                latent_dim=m.latent_dim,
                base_channels=m.vae_base_channels,
                scaling_factor=m.vae_scaling_factor,
                num_down_stages=m.vae_num_down_stages,
                dtype=dtype,
                zero_init_out=m.residual_mode,
                output_tanh=m.vae_output_tanh,
            )
            unet = UNet3D(
                latent_dim=m.latent_dim,
                model_channels=m.unet_model_channels,
                num_res_blocks=m.unet_num_res_blocks,
                attention_levels=tuple(m.unet_attention_levels),
                channel_mult=tuple(m.unet_channel_mult),
                num_heads=m.unet_num_heads,
                time_embed_dim=m.unet_time_embed_dim,
                use_checkpoint=use_ckpt,
                dtype=dtype,
            )
            return vae, unet

        # Training modules run at the policy compute dtype; inference modules
        # are pinned to f32 (the reference forces FP32 generation for
        # numerical stability, model.py:254-269).
        self.vae, self.unet = _make(self.policy.compute_dtype)
        self.vae_f32, self.unet_f32 = _make(jnp.float32)
        # w8a8 int8 inference variant of the UNet (opt-in via the pipeline's
        # quant='int8'): same architecture, heavy convs on the MXU's 2x int8
        # path (ops/quant.py). Params for it come from quantize_unet_params.
        self.unet_int8 = dataclasses.replace(
            self.unet, quant_int8=True, quant_matmuls=m.quant_attention_matmuls
        )
        # static-activation-scale variant (quant='int8_static'): same int8
        # param tree, plus an 'act_scales' variable collection of calibrated
        # per-site abs-max values (ops/quant.quantize_activation_static).
        self.unet_int8_static = dataclasses.replace(
            self.unet, quant_int8=True, quant_static=True,
            quant_matmuls=m.quant_attention_matmuls,
        )
        # w8a8 decoder variant (pipeline quant_vae='int8'): the decode stage
        # is the second-heaviest part of full-volume generation (~540 of
        # ~6275 TFLOP on the headline bench); its res-block/upsample convs
        # run int8 with dynamic per-call activation scales. Decode runs once
        # per volume, so static calibration isn't worth it there.
        self.vae_dec_int8 = dataclasses.replace(self.vae, quant_dec_int8=True)
        self.schedule: DiffusionSchedule = make_schedule(
            m.noise_schedule, m.diffusion_timesteps, m.beta_start, m.beta_end
        )
        self.latent_dim = m.latent_dim
        self.spatial_factor = 2 ** m.vae_num_down_stages
        # Pixel-space residual parametrization (schema.ModelConfig docs):
        # targets are (thin - trilinear(thick)) * gain, conditioning is a
        # space-to-depth fold of the trilinear upsample (cond_channels), and
        # generation adds the decoded residual back onto the upsample.
        self.residual_mode = m.residual_mode
        self.residual_gain = m.residual_gain
        self.cond_channels = (
            self.spatial_factor ** 2 * m.in_channels
            if m.residual_mode
            else m.latent_dim
        )
        if m.prediction_type not in PREDICTION_TYPES:
            raise ValueError(
                f"model.prediction_type={m.prediction_type!r}; expected one of "
                f"{PREDICTION_TYPES}"
            )
        self.prediction_type = m.prediction_type
        # losses: section (reference config:148-161). The reference parses it
        # but hardcodes use_ssim=False at model.py:218; here the knob works.
        lc = self.config.losses
        if not lc.use_diffusion_loss:
            raise ValueError(
                "losses.use_diffusion_loss=false is unsupported: the epsilon-"
                "MSE diffusion objective is the primary loss (the reference "
                "never honors false either, models/model.py:213-220)"
            )
        self.combined_loss = None
        perceptual = None
        use_perc = lc.use_perceptual_loss and lc.lambda_perceptual > 0
        if use_perc:
            # VGG19 feature loss (models/perceptual.py; reference
            # models/losses.py:22-146). Weights must be converted offline —
            # the TPU host cannot download torchvision checkpoints.
            if not lc.perceptual_weights_path:
                raise ValueError(
                    "losses.use_perceptual_loss needs "
                    "losses.perceptual_weights_path pointing at converted "
                    "VGG19 weights (scripts/convert_vgg_weights.py)"
                )
            from video_to_video_diffusion_tpu.models.perceptual import (
                VGGPerceptualLoss,
                load_vgg19_params,
            )

            perceptual = VGGPerceptualLoss(
                load_vgg19_params(lc.perceptual_weights_path)
            )
        if (lc.use_ms_ssim_loss and lc.lambda_ssim > 0) or use_perc:
            from video_to_video_diffusion_tpu.models.losses import CombinedLoss

            self.combined_loss = CombinedLoss(
                lambda_ssim=lc.lambda_ssim if lc.use_ms_ssim_loss else 0.0,
                ssim_every_n_steps=lc.ssim_every_n_steps,
                perceptual=perceptual,
                lambda_perceptual=lc.lambda_perceptual if use_perc else 0.0,
                perceptual_every_n_steps=lc.perceptual_every_n_steps,
            )

    # ------------------------------------------------------------------ init
    def init(
        self,
        key: jax.Array,
        patch_shape: Tuple[int, int, int] = (8, 192, 192),
        batch: int = 1,
    ) -> Dict[str, Any]:
        """Initialize {'vae', 'unet'} params with dummy NDHWC inputs.

        Jitted internally: eager init dispatches hundreds of individual ops,
        which is pathologically slow on remote-compile TPU backends.
        """
        D, H, W = patch_shape
        f = self.spatial_factor
        C = self.config.model.in_channels

        def _init(key):
            kv, ku = jax.random.split(key)
            x = jnp.zeros((batch, D, H, W, C), jnp.float32)
            vae_params = self.vae_f32.init(kv, x)["params"]
            z = jnp.zeros((batch, D, H // f, W // f, self.latent_dim), jnp.float32)
            c = jnp.zeros((batch, D, H // f, W // f, self.cond_channels), jnp.float32)
            t = jnp.zeros((batch,), jnp.int32)
            unet_params = self.unet_f32.init(ku, z, t, c)["params"]
            return {"vae": vae_params, "unet": unet_params}

        return jax.jit(_init)(key)

    # ------------------------------------------------------------- sub-calls
    def encode(self, params, x, f32: bool = False):
        mod = self.vae_f32 if f32 else self.vae
        return mod.apply({"params": params["vae"]}, x, method=mod.encode)

    def decode(self, params, z, f32: bool = False):
        mod = self.vae_f32 if f32 else self.vae
        return mod.apply({"params": params["vae"]}, z, method=mod.decode)

    def apply_unet(self, params, z_t, t, c, f32: bool = False):
        mod = self.unet_f32 if f32 else self.unet
        return mod.apply({"params": params["unet"]}, z_t, t, c)

    def vae_reconstruct(self, params, x, f32: bool = False):
        mod = self.vae_f32 if f32 else self.vae
        return mod.apply({"params": params["vae"]}, x)

    # --------------------------------------------------------- int8 inference
    def quantize_unet_params(self, params) -> Dict[str, Any]:
        """Trained tree -> {'unet': int8 tree} for apply_unet_q.

        Pure and jittable (jit it: the per-kernel abs-max/round passes over
        ~270M params dispatch hundreds of ops eagerly on a remote backend).
        """
        from video_to_video_diffusion_tpu.models.quantize import (
            quantize_params_like,
            unet_int8_structure,
        )

        latent_shape = (1, 8, 16, 16, self.latent_dim)
        structure = unet_int8_structure(
            self.unet_int8, latent_shape, cond_channels=self.cond_channels
        )
        return {"unet": quantize_params_like(structure, params["unet"])}

    def apply_unet_q(self, qparams, z_t, t, c):
        """UNet forward on int8-quantized params (from quantize_unet_params)."""
        return self.unet_int8.apply({"params": qparams["unet"]}, z_t, t, c)

    def quantize_vae_decoder_params(self, params) -> Dict[str, Any]:
        """Trained tree -> {'vae': decoder-int8 tree} for decode_q.

        Pure and jittable, like quantize_unet_params. Encoder leaves are
        copied unchanged (it stays at the compute dtype)."""
        from video_to_video_diffusion_tpu.models.quantize import (
            quantize_params_like,
            vae_int8_structure,
        )

        f = self.spatial_factor
        vol_shape = (1, 8, 4 * f, 4 * f, self.config.model.in_channels)
        structure = vae_int8_structure(self.vae_dec_int8, vol_shape)
        return {"vae": quantize_params_like(structure, params["vae"])}

    def decode_q(self, qparams, z):
        """VAE decode on the int8 decoder (from quantize_vae_decoder_params)."""
        return self.vae_dec_int8.apply(
            {"params": qparams["vae"]}, z, method=self.vae_dec_int8.decode
        )

    def init_unet_act_scales(self):
        """Zeroed 'act_scales' collection for the static-quant UNet.

        One f32 scalar per quant site; fill it with observe_unet_act_scales
        before using apply_unet_q_static (a zero scale would collapse every
        activation to 0 via the eps floor)."""
        from video_to_video_diffusion_tpu.models.quantize import unet_act_scales_zeros

        latent_shape = (1, 8, 16, 16, self.latent_dim)
        return unet_act_scales_zeros(
            self.unet_int8_static, latent_shape, cond_channels=self.cond_channels
        )

    def observe_unet_act_scales(self, qparams, act_scales, z_t, t, c):
        """One calibration forward: dynamic-quant output + updated abs-max.

        Runs the static UNet with mutable 'act_scales' — each quant site
        records max(old, abs(input).max()) and falls back to dynamic
        quantization for this call, so calibration outputs follow the same
        trajectory the dynamic int8 path would. Returns (eps, act_scales)."""
        eps, upd = self.unet_int8_static.apply(
            {"params": qparams["unet"], "act_scales": act_scales},
            z_t, t, c, mutable=["act_scales"],
        )
        return eps, upd["act_scales"]

    def apply_unet_q_static(self, qparams, z_t, t, c):
        """UNet forward on int8 params with calibrated static act scales.

        qparams: {'unet': int8 tree, 'act_scales': calibrated collection}
        (both passed as arguments so compiled sampling programs are reused
        across checkpoints)."""
        return self.unet_int8_static.apply(
            {"params": qparams["unet"], "act_scales": qparams["act_scales"]},
            z_t, t, c,
        )

    # ----------------------------------------------------------- residual
    def cond_pixels(self, v_in: jnp.ndarray, target_depth: int) -> jnp.ndarray:
        """Trilinear depth-upsampled conditioning volume (f32 pixels)."""
        v_in = v_in.astype(jnp.float32)
        if target_depth == v_in.shape[1]:
            return v_in
        return resize_trilinear(v_in, (target_depth, v_in.shape[2], v_in.shape[3]))

    def residualize(
        self, v_in: jnp.ndarray, v_gt: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(cond_up, scaled residual target) for residual-mode training."""
        cond_up = self.cond_pixels(v_in, v_gt.shape[1])
        r = (v_gt.astype(jnp.float32) - cond_up) * self.residual_gain
        return cond_up, r

    def compose_residual(self, cond_up: jnp.ndarray, r_hat: jnp.ndarray) -> jnp.ndarray:
        """trilinear upsample + decoded residual -> [-1, 1] volume."""
        out = cond_up.astype(jnp.float32) + r_hat.astype(jnp.float32) / self.residual_gain
        return jnp.clip(out, -1.0, 1.0)

    # ------------------------------------------------------------- training
    def loss_fn(
        self,
        params,
        v_in: jnp.ndarray,
        v_gt: jnp.ndarray,
        key: jax.Array,
        mask: Optional[jnp.ndarray] = None,
        step: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, dict]:
        """Diffusion training loss (reference model.py:158-228).

        Args:
          v_in: conditioning (thick) volume (B, D_in, H, W, C) in [-1, 1].
          v_gt: target (thin) volume (B, D_gt, H, W, C) in [-1, 1].
          mask: optional (B, D_gt) depth validity mask (full-volume mode).
          step: traced optimizer-step index; gates the every-N MS-SSIM term
            when losses.use_ms_ssim_loss is on. None (the validation path)
            skips the aux term entirely so val/loss always measures the
            pure epsilon-MSE objective — comparable across configs and to
            diffusion-only baselines, and free of the per-batch VAE decode.
        """
        if self.residual_mode:
            # residual parametrization: VAE-encode the scaled pixel residual,
            # condition on the exact upsampled pixels (space-to-depth fold —
            # no encoder between input and conditioning).
            cond_up, r = self.residualize(v_in, v_gt)
            z_gt = jax.lax.stop_gradient(self.encode(params, r))
            z_in = space_to_depth(cond_up, self.spatial_factor).astype(z_gt.dtype)
        else:
            z_in = jax.lax.stop_gradient(self.encode(params, v_in))
            z_gt = jax.lax.stop_gradient(self.encode(params, v_gt))

            if z_in.shape[1] != z_gt.shape[1]:
                # full-volume mode: align conditioning depth (model.py:185-205)
                z_in = resize_trilinear(z_in, z_gt.shape[1:4])
        z_mask = None
        if mask is not None:
            # depth mask -> latent depth via torch-nearest rule, broadcast to
            # (B, D, 1, 1, 1) against NDHWC latents
            m = mask.astype(jnp.float32)[:, :, None, None, None]
            if m.shape[1] != z_gt.shape[1]:
                m = resize_nearest(m, (z_gt.shape[1], 1, 1))
            z_mask = m

        kt, kn = jax.random.split(key)
        t = sample_timesteps(kt, z_gt.shape[0], self.schedule.timesteps)
        noise = jax.random.normal(kn, z_gt.shape, jnp.float32).astype(z_gt.dtype)
        z_t = q_sample(self.schedule, z_gt, t, noise)
        pred = self.apply_unet(params, z_t, t, z_in)
        target = prediction_target(self.schedule, self.prediction_type, z_gt, t, noise)
        loss, metrics = diffusion_training_loss(
            self.schedule, pred, target, t, mask=z_mask,
            prediction_type=self.prediction_type,
        )
        if self.combined_loss is not None and step is not None:
            # Gated MS-SSIM on the decoded predicted volume (reference
            # diffusion.py:204-243). The decode is differentiable through
            # z0_pred into the UNet; the VAE weights themselves see no
            # gradient (stop_gradient — they are frozen upstream anyway).
            from video_to_video_diffusion_tpu.models.diffusion import (
                predict_z0_from_pred,
            )

            frozen_vae = {"vae": jax.lax.stop_gradient(params["vae"])}

            def decoded():
                z0_pred = predict_z0_from_pred(
                    self.schedule, self.prediction_type, z_t, t, pred
                )
                v_pred = self.decode(frozen_vae, z0_pred)
                if self.residual_mode:
                    v_pred = self.compose_residual(cond_up, v_pred)
                return v_pred, v_gt

            loss, aux = self.combined_loss(loss, step, decoded_fn=decoded)
            metrics = {**metrics, **{k: v for k, v in aux.items() if k != "total"}}
        return loss, metrics

    # ------------------------------------------------------------ inference
    def generate(
        self,
        params,
        v_in: jnp.ndarray,
        key: jax.Array,
        sampler: str = "ddim",
        num_inference_steps: int = 20,
        target_depth: Optional[int] = None,
        eta: float = 0.0,
        precision: str = "policy",
        decode_chunk: Optional[int] = None,
    ) -> jnp.ndarray:
        """Thick -> thin volume generation (reference model.py:230-343).

        Pure and jittable for static (sampler, steps, target_depth).

        `precision`: 'policy' runs the VAE/UNet at the configured compute
        dtype (bf16 on TPU — bf16 keeps f32's exponent range, so the
        fp16-underflow rationale behind the reference's forced-FP32 inference
        (model.py:254-269) doesn't apply; the sampler's z/z0 arithmetic stays
        f32 either way). 'f32' pins the networks to f32 like the reference.

        `decode_chunk`: decode the final latents `decode_chunk` samples at a
        time via lax.map. The denoising loop runs on small latents and wants
        large batches for MXU utilization, while the decoder's full-res
        activations are HBM-bound — chunking decouples the two batch sizes.
        """
        from video_to_video_diffusion_tpu.inference.sampler import (
            ddim_sample,
            ddpm_sample,
            edm_sample,
        )

        f32 = precision == "f32"
        v_in = jnp.nan_to_num(v_in.astype(jnp.float32))
        cond_up = None
        if self.residual_mode:
            cond_up = self.cond_pixels(v_in, target_depth or v_in.shape[1])
            z_in = space_to_depth(cond_up, self.spatial_factor)
        else:
            z_in = self.encode(params, v_in, f32=f32).astype(jnp.float32)
            z_in = jnp.nan_to_num(z_in, posinf=1.0, neginf=-1.0)
            if target_depth is not None and target_depth != z_in.shape[1]:
                z_in = resize_trilinear(
                    z_in, (target_depth, z_in.shape[2], z_in.shape[3])
                )
        # residual-mode cond channels differ from latent_dim; the sampled
        # latent always has latent_dim channels on the conditioning grid
        latent_shape = (*z_in.shape[:-1], self.latent_dim)

        def eps_fn(z, t):
            out = self.apply_unet(params, z, t, z_in, f32=f32).astype(jnp.float32)
            return to_epsilon(self.schedule, self.prediction_type, z, t, out)

        if sampler == "ddpm":
            z0 = ddpm_sample(eps_fn, self.schedule, key, latent_shape)
        elif sampler == "ddim":
            z0 = ddim_sample(
                eps_fn, self.schedule, key, latent_shape, num_inference_steps, eta
            )
        elif sampler == "edm":
            z0 = edm_sample(
                eps_fn, self.schedule, key, latent_shape, num_inference_steps
            )
        else:
            raise ValueError(f"Unknown sampler: {sampler}")
        z0 = jnp.nan_to_num(z0, posinf=1.0, neginf=-1.0)
        B = z0.shape[0]
        if decode_chunk and decode_chunk < B and B % decode_chunk == 0:
            groups = z0.reshape(B // decode_chunk, decode_chunk, *z0.shape[1:])
            v_out = jax.lax.map(lambda zc: self.decode(params, zc, f32=f32), groups)
            v_out = v_out.reshape(B, *v_out.shape[2:]).astype(jnp.float32)
        else:
            v_out = self.decode(params, z0, f32=f32).astype(jnp.float32)
        if self.residual_mode:
            v_out = self.compose_residual(cond_up, v_out)
        return jnp.nan_to_num(v_out, posinf=1.0, neginf=-1.0)

    # ------------------------------------------------------------- metadata
    def count_parameters(self, params) -> Dict[str, int]:
        """Parameter counts (reference model.py:390-420)."""

        def count(tree):
            return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))

        vae = count(params["vae"])
        unet = count(params["unet"])
        return {
            "total": vae + unet,
            "trainable": vae + unet,
            "vae": vae,
            "unet": unet,
            "diffusion": 0,
        }
