"""Phase-1 VAE training (deterministic autoencoder) + CLI.

Rebuild of the reference `VAETrainer` / `train_vae.py` (training/train_vae.py:
42-634): AdamW + cosine-with-warmup, grad clip 1.0, bf16 compute (no
GradScaler needed on TPU), thick/thin sample mixing with `thick_slice_ratio`
(:286-293), per-batch PSNR, thin-slice validation with PSNR/SSIM, best +
keep-last-N checkpoint policy, resume, and the PSNR>=35 dB early-stop hint
(:566-568). "VAE" in name only — no KL term, like the reference (:43).

CLI: python -m video_to_video_diffusion_tpu.training.train_vae --config ... [--resume ...]
"""

from __future__ import annotations

import argparse
import os
import shutil
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from video_to_video_diffusion_tpu.config import Config, load_config
from video_to_video_diffusion_tpu.data.loader import get_unified_dataloader
from video_to_video_diffusion_tpu.data.windowing import from_model_range
from video_to_video_diffusion_tpu.models.losses import AutoencoderLoss
from video_to_video_diffusion_tpu.models.vae import SliceInterpolationVAE
from video_to_video_diffusion_tpu.ops.precision import Policy
from video_to_video_diffusion_tpu.ops.resize import resize_trilinear
from video_to_video_diffusion_tpu.parallel.sharding import shard_batch, shard_params
from video_to_video_diffusion_tpu.training.schedule import get_schedule
from video_to_video_diffusion_tpu.training.state import TrainState
from video_to_video_diffusion_tpu.utils.checkpoint import (
    find_latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from video_to_video_diffusion_tpu.utils.logger import setup_logger
from video_to_video_diffusion_tpu.utils.metrics import calculate_video_metrics, psnr
from video_to_video_diffusion_tpu.utils.tb import MetricWriter


class VAETrainer:
    def __init__(self, config, mesh=None, rng_seed: int = 0):
        self.config: Config = load_config(config)
        m, t = self.config.model, self.config.training
        self.mesh = mesh
        self.logger = setup_logger("vae_trainer")
        policy = Policy.from_precision(t.precision if t.mixed_precision else "f32")
        def _make_vae(dtype):
            return SliceInterpolationVAE(
                in_channels=m.in_channels,
                latent_dim=m.latent_dim,
                base_channels=m.vae_base_channels,
                scaling_factor=m.vae_scaling_factor,
                num_down_stages=m.vae_num_down_stages,
                use_checkpoint=self.config.hardware.gradient_checkpointing,
                dtype=dtype,
                zero_init_out=m.residual_mode,
                output_tanh=m.vae_output_tanh,
            )

        # Residual mode (schema.ModelConfig.residual_mode): the VAE
        # autoencodes (thin - trilinear(thick)) * gain instead of CT volumes;
        # with the zero-init decoder tail its end-to-end reconstruction
        # starts exactly at the trilinear-interpolation baseline.
        self.residual = m.residual_mode
        self.gain = m.residual_gain

        self.vae = _make_vae(policy.compute_dtype)
        self.vae_f32 = _make_vae(jnp.float32)
        perceptual = None
        if t.use_lpips or t.lpips_weight > 0:
            lpips_path = self.config.losses.lpips_weights_path
            if lpips_path:
                # exact lpips.LPIPS(net='vgg') (reference train_vae.py:56-96):
                # vgg16 backbone + learned per-channel linear weights,
                # converted offline (scripts/convert_vgg_weights.py --lpips)
                from video_to_video_diffusion_tpu.models.perceptual import (
                    LPIPSLoss,
                    load_lpips_params,
                )

                perceptual = LPIPSLoss(*load_lpips_params(lpips_path))
            else:
                # VGG19 feature-L1 stand-in (models/perceptual.py; the
                # documented delta when no LPIPS weights are shipped)
                path = self.config.losses.perceptual_weights_path
                if not path:
                    raise ValueError(
                        "training.use_lpips needs losses.lpips_weights_path "
                        "(exact LPIPS, scripts/convert_vgg_weights.py --lpips)"
                        " or losses.perceptual_weights_path (VGG19 feature-L1"
                        " stand-in); the TPU host cannot download torch "
                        "checkpoints"
                    )
                from video_to_video_diffusion_tpu.models.perceptual import (
                    VGGPerceptualLoss,
                    load_vgg19_params,
                )

                perceptual = VGGPerceptualLoss(load_vgg19_params(path))
        self.criterion = AutoencoderLoss(
            use_ssim=t.use_ssim_loss,
            ssim_weight=t.ssim_loss_weight,
            every_n_steps=t.aux_loss_every_n_steps,
            perceptual=perceptual,
            perceptual_weight=t.lpips_weight if perceptual is not None else 0.0,
            perceptual_every_n_steps=self.config.losses.perceptual_every_n_steps,
        )
        self.key = jax.random.PRNGKey(rng_seed)
        self.suffix = f"_{t.model_suffix}" if t.model_suffix else ""
        self.ckpt_dir = os.path.join(t.checkpoint_dir, t.experiment_name)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.writer = MetricWriter(os.path.join(t.log_dir, t.experiment_name))

        d = self.config.data
        self.key, k = jax.random.split(self.key)
        dummy = jnp.zeros((1, d.patch_depth_thick, *d.patch_size, m.in_channels))
        params = jax.jit(lambda kk: self.vae_f32.init(kk, dummy)["params"])(k)
        if mesh is not None:
            params = shard_params(params, mesh)
        self.params_template = params

        self.epoch = 0
        self.global_step = 0
        self.best_psnr = -float("inf")
        self.best_val_loss = float("inf")
        self.saved_epochs = []

        self._tx = None
        self._train_step = None
        self.state = None

    # --------------------------------------------------------------- wiring
    def setup_optimizer(self, steps_per_epoch: int) -> None:
        t = self.config.training
        # schedule ticks per optimizer step (MultiSteps: once per k micro-steps)
        accum = max(t.gradient_accumulation_steps, 1)
        total = max(t.num_epochs * steps_per_epoch // accum, 1)
        self.lr_schedule = get_schedule(
            t.scheduler, t.learning_rate, total,
            warmup_steps=t.warmup_epochs * steps_per_epoch // accum,
            min_lr=t.min_lr,
        )
        self._tx = optax.chain(
            optax.clip_by_global_norm(t.max_grad_norm),
            optax.adamw(self.lr_schedule, weight_decay=t.weight_decay),
        )
        if t.gradient_accumulation_steps > 1:
            self._tx = optax.MultiSteps(
                self._tx, every_k_schedule=t.gradient_accumulation_steps
            )
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self.params_template,
            opt_state=self._tx.init(self.params_template),
        )

        vae, criterion, tx = self.vae, self.criterion, self._tx
        gain = self.gain

        def residualize(thick: jnp.ndarray, thin: jnp.ndarray):
            """(thick, thin) -> (trilinear cond, scaled pixel residual)."""
            cond = resize_trilinear(
                thick.astype(jnp.float32),
                (thin.shape[1], thin.shape[2], thin.shape[3]),
            )
            return cond, (thin.astype(jnp.float32) - cond) * gain

        def train_step_residual(state: TrainState, thick: jnp.ndarray, thin: jnp.ndarray):
            cond, x = residualize(thick, thin)

            def loss_fn(p):
                recon, _z = vae.apply({"params": p}, x)
                loss, aux = criterion(recon, x, state.step)
                return loss, (aux, recon)

            (loss, (aux, recon)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            aux = dict(aux)
            aux["grad_norm"] = optax.global_norm(grads)
            # end-to-end PSNR vs the thin ground truth (directly comparable
            # to the trilinear baseline), not residual-space PSNR
            e2e = jnp.clip(cond + recon.astype(jnp.float32) / gain, -1.0, 1.0)
            aux["psnr"] = psnr(from_model_range(e2e), from_model_range(thin))
            return TrainState(step=state.step + 1, params=params, opt_state=opt_state), aux

        def train_step(state: TrainState, x: jnp.ndarray):
            def loss_fn(p):
                recon, _z = vae.apply({"params": p}, x)
                loss, aux = criterion(recon, x, state.step)
                return loss, (aux, recon)

            (loss, (aux, recon)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            aux = dict(aux)
            aux["grad_norm"] = optax.global_norm(grads)
            # per-batch PSNR on [0,1] (reference train_vae.py:349-354), from
            # the training-forward recon — a second forward would double the
            # activation footprint.
            aux["psnr"] = psnr(
                from_model_range(recon.astype(jnp.float32)), from_model_range(x)
            )
            return TrainState(step=state.step + 1, params=params, opt_state=opt_state), aux

        # donate the state so params/opt-state update in place (saves ~1 GB
        # of transient HBM at 90M params)
        self._train_step = jax.jit(
            train_step_residual if self.residual else train_step, donate_argnums=(0,)
        )
        vf32 = self.vae_f32
        self._reconstruct = jax.jit(lambda p, x: vf32.apply({"params": p}, x)[0])

        def val_residual(p, thick, thin):
            """Residual-mode validation: (end-to-end volume, trilinear cond)."""
            cond, x = residualize(thick, thin)
            recon = vf32.apply({"params": p}, x)[0]
            e2e = jnp.clip(cond + recon.astype(jnp.float32) / gain, -1.0, 1.0)
            return e2e, cond

        self._val_residual = jax.jit(val_residual)

    # ------------------------------------------------------------------ data
    def _pick_volume(self, batch: Dict, rng: np.random.Generator) -> np.ndarray:
        """thick-or-thin mixing with thick_slice_ratio (reference :286-293).

        Thick patches have a different depth than thin; both are valid VAE
        inputs since the VAE preserves depth.
        """
        ratio = self.config.training.thick_slice_ratio
        use_thick = rng.random() < ratio
        return batch["input"] if use_thick else batch["target"]

    def _put(self, x: np.ndarray):
        if self.mesh is not None:
            return shard_batch({"x": x}, self.mesh)["x"]
        return jax.device_put(x)

    # ----------------------------------------------------------------- train
    def train_epoch(self, train_loader) -> Dict[str, float]:
        rng = np.random.default_rng(1234 + self.epoch)
        losses, psnrs = [], []
        for i, batch in enumerate(train_loader):
            if self.residual:
                self.state, aux = self._train_step(
                    self.state, self._put(batch["input"]), self._put(batch["target"])
                )
            else:
                x = self._put(self._pick_volume(batch, rng))
                self.state, aux = self._train_step(self.state, x)
            # host-side counter + device-resident metrics: float()-ing every
            # step would force a device sync per step and stall dispatch
            self.global_step += 1
            losses.append(aux["total"])
            psnrs.append(aux["psnr"])
            if self.config.training.log_interval and i % self.config.training.log_interval == 0:
                self.writer.add_scalar("vae_train/loss", float(aux["total"]), self.global_step)
                self.writer.add_scalar("vae_train/psnr", float(aux["psnr"]), self.global_step)
                # the schedule ticks once per optimizer step (MultiSteps), while
                # global_step counts micro-steps — index by optimizer steps or
                # the logged LR runs `accum`x ahead of the applied one
                accum = max(self.config.training.gradient_accumulation_steps, 1)
                self.writer.add_scalar(
                    "vae_train/lr",
                    float(self.lr_schedule(self.global_step // accum)),
                    self.global_step,
                )
        # single batched readback (see trainer.train_epoch: per-scalar
        # float() is a relay round-trip each on tunneled TPU backends)
        return {
            "loss": float(jnp.stack(losses).mean()) if losses else float("nan"),
            "psnr": float(jnp.stack(psnrs).mean()) if psnrs else float("nan"),
        }

    def validate(self, val_loader, max_batches: Optional[int] = 16) -> Dict[str, float]:
        """Thin-slice validation with PSNR/SSIM (reference :383-452)."""
        losses, psnrs, ssims, tri_psnrs = [], [], [], []
        for i, batch in enumerate(val_loader):
            if max_batches is not None and i >= max_batches:
                break
            x = batch["target"]  # thin only
            if self.residual:
                # score the END-TO-END volume (trilinear + decoded residual)
                # against the thin ground truth — the number that must beat
                # the trilinear baseline, which is logged alongside
                e2e, cond = self._val_residual(
                    self.state.params, self._put(batch["input"]), self._put(x)
                )
                recon, cond = np.asarray(e2e), np.asarray(cond)
                tri_psnrs.append(
                    float(psnr(
                        jnp.asarray(from_model_range(cond)),
                        jnp.asarray(from_model_range(np.asarray(x))),
                    ))
                )
            else:
                recon = np.asarray(self._reconstruct(self.state.params, self._put(x)))
            losses.append(float(np.mean((recon - x) ** 2)))
            m = calculate_video_metrics(from_model_range(recon), from_model_range(x))
            psnrs.append(m["psnr"])
            ssims.append(m["ssim"])
        out = {
            "val_loss": float(np.mean(losses)) if losses else float("nan"),
            "val_psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
            "val_ssim": float(np.mean(ssims)) if ssims else float("nan"),
        }
        if tri_psnrs:
            out["val_psnr_trilinear"] = float(np.mean(tri_psnrs))
        for k, v in out.items():
            self.writer.add_scalar(f"vae_val/{k}", v, self.global_step)
        return out

    # ----------------------------------------------------------- checkpoints
    def _metadata(self):
        return {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "best_psnr": self.best_psnr,
            "best_val_loss": self.best_val_loss,
            "config": self.config.to_dict(),
        }

    def save_epoch_checkpoint(self, is_best: bool) -> None:
        """vae_epoch_* + vae_best, keep-last-N pruning (reference :454-487).

        Epoch checkpoints honor checkpoint_every_n_epochs (each save is a
        full device_get of params+opt_state — minutes over a remote-TPU
        tunnel); the best checkpoint is always written when it improves.
        """
        t = self.config.training
        every = max(t.checkpoint_every_n_epochs, 1)
        if (self.epoch + 1) % every == 0 or self.epoch + 1 == t.num_epochs:
            name = f"vae_epoch_{self.epoch:04d}{self.suffix}"
            path = os.path.join(self.ckpt_dir, name)
            save_checkpoint(path, {"params": self.state.params, "opt_state": self.state.opt_state}, self._metadata())
            self.saved_epochs.append(path)
            while len(self.saved_epochs) > t.keep_last_n_checkpoints:
                old = self.saved_epochs.pop(0)
                shutil.rmtree(old, ignore_errors=True)
        if is_best:
            best = os.path.join(self.ckpt_dir, f"vae_best{self.suffix}")
            save_checkpoint(best, {"params": self.state.params, "opt_state": self.state.opt_state}, self._metadata())
            self.logger.info("new best VAE checkpoint: %s", best)

    def load_checkpoint(self, path: str) -> None:
        target = jax.device_get(
            {"params": self.state.params, "opt_state": self.state.opt_state}
        )
        restored, meta = load_checkpoint(path, target=target)
        self.state = TrainState(
            step=jnp.asarray(meta.get("global_step", 0), jnp.int32),
            params=restored["params"],
            opt_state=restored["opt_state"],
        )
        self.epoch = int(meta.get("epoch", 0)) + 1
        self.global_step = int(meta.get("global_step", 0))
        self.best_psnr = float(meta.get("best_psnr", -float("inf")))
        self.best_val_loss = float(meta.get("best_val_loss", float("inf")))

    # ------------------------------------------------------------------ run
    def train(self, train_loader, val_loader) -> Dict[str, float]:
        t = self.config.training
        if self.state is None:
            self.setup_optimizer(max(len(train_loader), 1))
        out: Dict[str, float] = {}
        for epoch in range(self.epoch, t.num_epochs):
            self.epoch = epoch
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            t0 = time.time()
            stats = self.train_epoch(train_loader)
            val = self.validate(val_loader)
            out = {**stats, **val}
            self.logger.info(
                "VAE epoch %d: loss=%.5f train_psnr=%.2f val_psnr=%.2f val_ssim=%.4f (%.1fs)",
                epoch, stats["loss"], stats["psnr"], val["val_psnr"], val["val_ssim"],
                time.time() - t0,
            )
            is_best = val["val_psnr"] > self.best_psnr
            if is_best:
                self.best_psnr = val["val_psnr"]
                self.best_val_loss = val["val_loss"]
            self.save_epoch_checkpoint(is_best)
            if val["val_psnr"] >= 35.0:
                # early-stop hint (reference train_vae.py:566-568)
                self.logger.info(
                    "val PSNR %.2f dB >= 35 dB — VAE good enough for diffusion",
                    val["val_psnr"],
                )
        return out


def main(argv=None) -> Dict[str, float]:
    parser = argparse.ArgumentParser(description="Train the slice-interpolation VAE")
    parser.add_argument("--config", type=str, default="vae_training")
    parser.add_argument("--resume", type=str, default=None)
    args = parser.parse_args(argv)

    cfg = load_config(args.config)
    from video_to_video_diffusion_tpu.utils.platform import (
        configure_platform,
        enable_compilation_cache,
    )

    configure_platform(cfg.hardware.device)
    enable_compilation_cache()
    # Mesh like the diffusion CLI (train.py): VAE training at 48x192x192
    # needs a mesh or remat+accum on a 16 GB chip; without one the
    # documented multi-chip escape hatch was unreachable from this CLI.
    mesh = None
    if cfg.hardware.distributed and len(jax.devices()) > 1:
        from video_to_video_diffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(
            cfg.hardware.num_devices,
            tensor_parallel=max(cfg.hardware.mesh_tensor_axis, 1),
            data_parallel=max(cfg.hardware.mesh_data_axis, 0),
        )
        setup_logger("vae_trainer").info("mesh: %s", mesh)
    trainer = VAETrainer(cfg, mesh=mesh)
    train_loader = get_unified_dataloader(cfg, "train")
    val_loader = get_unified_dataloader(cfg, "val")
    trainer.setup_optimizer(max(len(train_loader), 1))
    resume = args.resume or find_latest_checkpoint(trainer.ckpt_dir, trainer.suffix)
    if resume:
        trainer.load_checkpoint(resume)
    return trainer.train(train_loader, val_loader)


if __name__ == "__main__":
    main()
