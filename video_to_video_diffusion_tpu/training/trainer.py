"""Diffusion training engine.

Rebuild of the reference `Trainer` (training/trainer.py:17-912): epoch loop
with gradient accumulation and clipping, layer-wise LR groups with frozen
VAE, multi-tier validation (Tier 1 loss-only / Tier 2 patch metrics with
best-checkpoint selection / Tier 3 full-volume stitching), TensorBoard
scalars, best+final checkpoint policy with suffix naming, resume.

TPU specifics: the whole optimization step is one jitted function (grads +
optimizer in a single XLA program); batches are device_put with the leading
axis sharded over the mesh 'data' axis, so the gradient all-reduce is an XLA
psum over ICI; bf16 compute needs no GradScaler; data/step wall-times are
tracked like the reference's tqdm postfix timers (:199-275).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_to_video_diffusion_tpu.config import Config, load_config
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion
from video_to_video_diffusion_tpu.parallel.sharding import shard_batch, shard_params
from video_to_video_diffusion_tpu.training.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from video_to_video_diffusion_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from video_to_video_diffusion_tpu.utils.logger import setup_logger
from video_to_video_diffusion_tpu.utils.metrics import calculate_video_metrics
from video_to_video_diffusion_tpu.utils.tb import MetricWriter
from video_to_video_diffusion_tpu.data.windowing import from_model_range


class Trainer:
    # jax.profiler trace destination (train.py --profile <dir>): when set,
    # train_epoch captures steps 1..PROFILE_STEPS of the next epoch it runs
    # (step 0 is compile) into profile_dir, once, then clears itself.
    profile_dir: Optional[str] = None
    PROFILE_STEPS = 6

    def __init__(
        self,
        model: VideoToVideoDiffusion,
        config,
        train_loader,
        val_loader=None,
        full_val_loader=None,
        mesh=None,
        params=None,
        rng_seed: int = 0,
    ):
        self.model = model
        self.config: Config = load_config(config)
        t = self.config.training
        self.train_loader = train_loader
        self.val_loader = val_loader
        self._val_cache = None  # memoized pinned validation batches
        self.full_val_loader = full_val_loader
        self.mesh = mesh
        self.logger = setup_logger("trainer")
        self.suffix = f"_{t.model_suffix}" if t.model_suffix else ""
        self.ckpt_dir = os.path.join(t.checkpoint_dir, t.experiment_name)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.writer = MetricWriter(os.path.join(t.log_dir, t.experiment_name))

        self.key = jax.random.PRNGKey(rng_seed)
        if params is None:
            d = self.config.data
            self.key, k = jax.random.split(self.key)
            params = model.init(
                k,
                patch_shape=(d.patch_depth_thick, *d.patch_size),
                batch=1,
            )
        steps_per_epoch = max(len(train_loader), 1)
        total_opt_steps = max(
            t.num_epochs * steps_per_epoch // max(t.gradient_accumulation_steps, 1), 1
        )
        self.tx, self.lr_schedule = make_optimizer(
            self.config, params, total_opt_steps, steps_per_epoch
        )
        if mesh is not None:
            params = shard_params(params, mesh)
        ema_decay = self.config.training.ema_decay
        self.state = create_train_state(params, self.tx, ema=ema_decay > 0.0)

        def loss_fn(p, batch, key, step=None):
            return model.loss_fn(
                p, batch["input"], batch["target"], key,
                mask=batch.get("thin_mask"), step=step,
            )

        self._train_step = jax.jit(
            make_train_step(
                loss_fn, self.tx, ema_decay=ema_decay,
                accum_steps=t.gradient_accumulation_steps,
            ),
            donate_argnums=(0,),
        )
        self._eval_loss = jax.jit(
            lambda p, batch, key: loss_fn(p, batch, key)[0]
        )

        self.epoch = 0
        self.global_step = 0  # optimizer steps (post-accumulation)
        self._micro_step = 0
        self.best_loss = float("inf")
        self.best_ckpt_path: Optional[str] = None
        self.current_phase = 1
        # which weights ('raw'|'ema') scored the last Tier-2 patch_loss —
        # recorded in checkpoint metadata so eval tooling scores the side
        # the best checkpoint was actually selected on
        self._last_best_weights = "raw"
        # Tier-2 trilinear-baseline metrics, memoized per pinned val batch
        # (they never change across epochs); the resize is jitted once —
        # an eager resize on the tunneled TPU is a per-op remote dispatch.
        self._tri_metric_cache = []
        from video_to_video_diffusion_tpu.ops.resize import resize_trilinear

        self._jit_tri_resize = jax.jit(
            lambda x, td: resize_trilinear(
                x.astype(jnp.float32), (td, x.shape[2], x.shape[3])
            ),
            static_argnums=(1,),
        )

    # ------------------------------------------------------------ two-phase
    def set_phase(self, phase: int) -> None:
        """Two-phase training transition (reference trainer.py:717-732).

        Phase 1 trains with the VAE frozen; phase 2 unfreezes it at
        `pretrained.phase1_epochs`. Because freezing lives in the optimizer
        here, the transition rebuilds the optimizer (fresh moments for the
        newly-unfrozen VAE groups) and re-jits the train step.
        """
        if phase == self.current_phase:
            return
        self.current_phase = phase
        p = self.config.pretrained
        mults = (
            {"vae_encoder": p.lr_mult_vae_encoder, "vae_decoder": p.lr_mult_vae_decoder, "unet": p.lr_mult_unet}
            if phase == 1
            else {"vae_encoder": 1.0, "vae_decoder": 1.0, "unet": 1.0}
        )
        t = self.config.training
        steps_per_epoch = max(len(self.train_loader), 1)
        total = max(
            t.num_epochs * steps_per_epoch // max(t.gradient_accumulation_steps, 1), 1
        )
        self.tx, self.lr_schedule = make_optimizer(
            self.config, self.state.params, total, steps_per_epoch, lr_multipliers=mults
        )
        ema_decay = t.ema_decay
        prev_ema = self.state.ema_params
        self.state = create_train_state(
            self.state.params, self.tx,
            ema=ema_decay > 0.0 and prev_ema is None,
        )
        if prev_ema is not None:
            self.state = self.state.replace(ema_params=prev_ema)
        model = self.model

        def loss_fn(pp, batch, key, step=None):
            return model.loss_fn(
                pp, batch["input"], batch["target"], key,
                mask=batch.get("thin_mask"), step=step,
            )

        self._train_step = jax.jit(
            make_train_step(
                loss_fn, self.tx, ema_decay=ema_decay,
                accum_steps=t.gradient_accumulation_steps,
            ),
            donate_argnums=(0,),
        )
        self.logger.info("entered training phase %d (lr multipliers %s)", phase, mults)

    # ----------------------------------------------------------------- utils
    def _put(self, batch: Dict) -> Dict:
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if self.mesh is not None:
            return shard_batch(arrays, self.mesh)
        return {k: jax.device_put(v) for k, v in arrays.items()}

    def _next_key(self) -> jax.Array:
        self.key, k = jax.random.split(self.key)
        return k

    @property
    def eval_params(self):
        """Weights used for validation/generation: the EMA average when
        training.ema_decay > 0, else the live params."""
        return (
            self.state.ema_params
            if self.state.ema_params is not None
            else self.state.params
        )

    # ----------------------------------------------------------------- train
    def train_epoch(self) -> Dict[str, float]:
        t = self.config.training
        accum = max(t.gradient_accumulation_steps, 1)
        losses = []
        log_pending = []  # (step, device loss, device grad_norm)
        data_time = step_time = 0.0
        t_last = time.time()
        tracing = False
        for i, batch in enumerate(self.train_loader):
            if self.profile_dir and i == 1:
                # step 0 is the compile; trace a handful of steady steps
                jax.profiler.start_trace(self.profile_dir)
                tracing = True
            dev_batch = self._put(batch)
            data_time += time.time() - t_last
            t0 = time.time()
            self.state, metrics = self._train_step(self.state, dev_batch, self._next_key())
            if tracing and i >= self.PROFILE_STEPS:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                self.logger.info("profiler trace written to %s", self.profile_dir)
                self.profile_dir, tracing = None, False
            # keep the loss as a device scalar — float()-ing it here would
            # block dispatch of the next step on every micro-step
            losses.append(metrics["loss"])
            step_time += time.time() - t0
            self._micro_step += 1
            self.global_step = self._micro_step // accum
            if t.log_interval and (i % t.log_interval == 0):
                # defer: float()-ing device scalars here costs a relay
                # round-trip each (~0.5 s); flushed in one readback below
                log_pending.append(
                    (self.global_step, metrics["loss"], metrics["grad_norm"])
                )
            t_last = time.time()
        if tracing:  # epoch shorter than PROFILE_STEPS
            jax.profiler.stop_trace()
            self.profile_dir = None
        # ONE batched readback: float()-ing the per-step scalars one by one
        # costs a full relay round-trip EACH over a tunneled TPU backend —
        # measured ~450 s for an 876-step epoch (vs ~170 s of everything
        # else) on the round-3 quality run before this fix.
        if log_pending:
            steps = [s for s, _, _ in log_pending]
            flat = np.asarray(
                jnp.stack([jnp.stack((l, g)) for _, l, g in log_pending])
            )
            # one vectorized schedule eval (the schedule is jnp ops — calling
            # it per-step with a Python int would run eagerly on the TPU)
            lrs = np.asarray(self.lr_schedule(jnp.asarray(steps)))
            for (step, (loss_v, gnorm_v), lr_v) in zip(steps, flat, lrs):
                self.writer.add_scalar("train/loss", float(loss_v), step)
                self.writer.add_scalar("train/lr", float(lr_v), step)
                self.writer.add_scalar("train/grad_norm", float(gnorm_v), step)
        return {
            "loss": float(jnp.stack(losses).mean()) if losses else float("nan"),
            "data_time": data_time,
            "step_time": step_time,
        }

    # ------------------------------------------------------------ validation
    _VAL_CACHE_BATCHES = 16  # cap on device-pinned validation batches

    def _val_iter(self, max_batches: Optional[int] = None):
        """Validation batches with pinned randomness, memoized on device.

        Both the patch draw (loader epoch) and the diffusion timestep/noise
        keys are fixed across validations — diffusion loss varies ~100x over
        timesteps, so a freshly-sampled eval would rank checkpoints by draw
        luck rather than model quality. Because the draws are pinned, the
        first _VAL_CACHE_BATCHES batches are device_put once and replayed:
        re-extracting + re-uploading them cost ~34 s of host time per epoch
        on v5e (vs ~6 s of training compute). Callers needing more than the
        cap (final_validate over everything) stream fresh from the loader —
        identical draws, just not pinned in HBM.
        """
        cap = self._VAL_CACHE_BATCHES
        val_key = jax.random.PRNGKey(10_000)
        if max_batches is None or max_batches > cap:
            if hasattr(self.val_loader, "set_epoch"):
                self.val_loader.set_epoch(0)
            for i, batch in enumerate(self.val_loader):
                yield self._put(batch), jax.random.fold_in(val_key, i)
            return
        # Fill the cache lazily to the largest max_batches actually requested
        # (extending on later larger requests) — eagerly pinning the full cap
        # would hold up to 2x the needed HBM on a memory-tight v5e.
        if self._val_cache is None:
            self._val_cache = []
        if len(self._val_cache) < max_batches:
            if hasattr(self.val_loader, "set_epoch"):
                self.val_loader.set_epoch(0)
            for i, batch in enumerate(self.val_loader):
                if i >= max_batches:
                    break
                if i < len(self._val_cache):
                    continue  # identical draws: loader epoch is pinned to 0
                self._val_cache.append(
                    (self._put(batch), jax.random.fold_in(val_key, i))
                )
        yield from self._val_cache[:max_batches]

    def validate_loss_only(self, max_batches: Optional[int] = None) -> float:
        """Tier 1 (reference trainer.py:413-445).

        All eval steps are dispatched asynchronously against the cached
        device-resident batches and read back ONCE — per-batch float()
        readbacks cost a full relay round-trip each on the tunneled TPU
        (measured ~40 s/epoch for 8 batches vs ~6 s of training compute).
        """
        if self.val_loader is None:
            return float("nan")
        losses = []
        for i, (batch, vkey) in enumerate(self._val_iter(max_batches=max_batches)):
            if max_batches is not None and i >= max_batches:
                break
            losses.append(self._eval_loss(self.eval_params, batch, vkey))
        val = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        self.writer.add_scalar("val/loss", val, self.global_step)
        return val

    def validate_patches(self, num_samples: Optional[int] = None, generate: bool = None) -> Dict[str, float]:
        """Tier 2: patch loss (+ optional DDIM generation metrics).

        Reference trainer.py:447-526; drives best-checkpoint selection.
        """
        t = self.config.training
        if generate is None:
            generate = t.patch_val_generate
        if self.val_loader is None:
            return {}
        num_samples = num_samples or t.patch_val_samples
        losses, losses_ema = [], []
        kept = []  # (batch, vkey) replay list for the generation pass
        seen = 0
        ema = self.state.ema_params
        for batch, vkey in self._val_iter(max_batches=num_samples):
            # Always score the RAW params; score the EMA average too when
            # enabled. During EMA decay warmup the average can trail the live
            # weights (docs/RESULTS.md round-2 finding: 11.88 vs 12.97 dB
            # post-reset), so best-checkpoint selection takes the min of the
            # two — the saved tree holds both, and metadata records which
            # side won ('best_weights').
            losses.append(self._eval_loss(self.state.params, batch, vkey))
            if ema is not None:
                losses_ema.append(self._eval_loss(ema, batch, vkey))
            kept.append((batch, vkey))
            seen += batch["input"].shape[0]
            if seen >= num_samples:
                break
        raw_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        out = {"patch_loss": raw_loss, "patch_loss_raw": raw_loss}
        if losses_ema:
            ema_loss = float(jnp.mean(jnp.stack(losses_ema)))
            out["patch_loss_ema"] = ema_loss
            if np.isfinite(ema_loss) and (
                not np.isfinite(raw_loss) or ema_loss < raw_loss
            ):
                out["patch_loss"] = ema_loss
        self._last_best_weights = (
            "ema"
            if losses_ema and out["patch_loss"] == out.get("patch_loss_ema")
            else "raw"
        )
        if generate and kept:
            # Generation metrics are scored on BOTH weight sides (cheap:
            # the staged jits are shared), and `patch_psnr` reports the side
            # that won the loss min above — the side save_checkpoint records
            # as 'best_weights'. Scoring only eval_params (= EMA) here used
            # to understate the saved checkpoint during EMA warmup, the
            # exact measured failure of round 2 (11.88 vs 12.97 dB).
            sides = {"raw": self.state.params}
            if ema is not None:
                sides["ema"] = ema
            gen_psnrs = {name: [] for name in sides}
            gen_ssims = {name: [] for name in sides}
            from video_to_video_diffusion_tpu.inference.pipeline import (
                staged_generate,
            )

            for bi, (batch, vkey) in enumerate(kept):
                target_depth = batch["target"].shape[1]
                target_host = from_model_range(np.asarray(batch["target"]))
                for name, params in sides.items():
                    # staged_generate, NOT a monolithic jit of
                    # model.generate: the fused encode+DDIM+decode program
                    # takes tens of minutes to compile through the remote
                    # TPU tunnel, while the staged jits are shared with the
                    # pipeline/eval scripts and the persistent cache.
                    gen = staged_generate(
                        self.model, params, batch["input"], vkey,
                        num_inference_steps=20, target_depth=target_depth,
                    )
                    m = calculate_video_metrics(
                        from_model_range(np.asarray(gen)), target_host
                    )
                    gen_psnrs[name].append(m["psnr"])
                    gen_ssims[name].append(m["ssim"])
                if getattr(self.model, "residual_mode", False):
                    # trilinear baseline on the SAME patches: in residual
                    # mode generation starts at this floor, so patch_psnr <
                    # patch_psnr_trilinear flags a diffusion stage that is
                    # subtracting value. The val draws are pinned
                    # (_val_iter), so this constant is computed once per
                    # run and memoized — recomputing it ran an eager
                    # (unjitted) resize on the TPU every epoch.
                    while len(self._tri_metric_cache) <= bi:
                        self._tri_metric_cache.append(None)
                    if self._tri_metric_cache[bi] is None:
                        tri = np.clip(np.asarray(self._jit_tri_resize(
                            batch["input"], target_depth
                        )), -1.0, 1.0)
                        self._tri_metric_cache[bi] = calculate_video_metrics(
                            from_model_range(tri), target_host
                        )
            win = self._last_best_weights if self._last_best_weights in gen_psnrs else "raw"
            out["patch_psnr"] = float(np.mean(gen_psnrs[win]))
            out["patch_ssim"] = float(np.mean(gen_ssims[win]))
            for name in sides:
                out[f"patch_psnr_{name}"] = float(np.mean(gen_psnrs[name]))
                out[f"patch_ssim_{name}"] = float(np.mean(gen_ssims[name]))
            tri_ms = [m for m in self._tri_metric_cache[: len(kept)] if m]
            if tri_ms:
                out["patch_psnr_trilinear"] = float(
                    np.mean([m["psnr"] for m in tri_ms])
                )
        for k, v in out.items():
            self.writer.add_scalar(f"val/{k}", v, self.global_step)
        return out

    def validate_full_volumes(self, num_samples: Optional[int] = None, steps: int = 20) -> Dict[str, float]:
        """Tier 3: sliding-window stitched full volumes (reference :528-603).

        Single-chip: the pipelined stitcher, whose stage jits are cached per
        model — a per-call jit closure here would recompile the
        encode+DDIM+decode pipeline (minutes) on every Tier-3 validation.
        With a mesh: the patch grid is fanned out over the 'data' axis via
        parallel.stitching.sample_with_stitching_sharded (each sliding-window
        patch is an independent DDIM sample — embarrassingly parallel).
        """
        from video_to_video_diffusion_tpu.inference.pipeline import (
            generate_volume,
            pad_depth_to_bucket,
        )

        t = self.config.training
        d = self.config.data
        if self.full_val_loader is None:
            return {}
        num_samples = num_samples or t.full_val_samples
        patch_kw = dict(
            num_inference_steps=steps,
            patch_size=(d.patch_depth_thick, *d.patch_size),
            target_patch_size=(d.patch_depth_thin, *d.patch_size),
            stride=(
                max(d.patch_depth_thick // 2, 1),
                d.patch_size[0] // 2,
                d.patch_size[1] // 2,
            ),
        )
        psnrs, ssims = [], []
        seen = 0
        for batch in self.full_val_loader:
            for b in range(batch["input"].shape[0]):
                thick = jnp.asarray(batch["input"][b : b + 1])
                n_thick = int(batch["thick_mask"][b].sum()) if "thick_mask" in batch else thick.shape[1]
                n_thin = int(batch["thin_mask"][b].sum()) if "thin_mask" in batch else batch["target"].shape[1]
                thick = thick[:, :n_thick]
                # Match the training-time conditioning geometry: the patch
                # dataset resamples each thick sub-stack so patch_depth_thick
                # slices span a patch_depth_thin window (datasets.py
                # extract_random_patch). The stitcher generates at that fixed
                # ratio, so a source with a different thick:thin ratio (e.g.
                # the 5x synthetic cache vs the 6x patch geometry) must be
                # depth-resampled to ceil(n_thin / ratio) slices first —
                # without this, generated depth is stretched vs the target.
                ratio = d.patch_depth_thin // max(d.patch_depth_thick, 1)
                want_thick = -(-n_thin // ratio)
                if want_thick != thick.shape[1]:
                    from video_to_video_diffusion_tpu.data.windowing import (
                        linear_resample_depth,
                    )

                    thick = jnp.asarray(
                        linear_resample_depth(np.asarray(thick[0]), want_thick)
                    )[None]
                # Depth-bucket to multiples of the patch depth so every
                # distinct patient depth does NOT compile its own stage
                # programs (minutes each over a remote tunnel); the padded
                # tail is trimmed from the stitched output below.
                thick, d_orig = pad_depth_to_bucket(thick, d.patch_depth_thick)
                if self.mesh is not None:
                    from video_to_video_diffusion_tpu.parallel.stitching import (
                        sample_with_stitching_sharded,
                    )

                    out = sample_with_stitching_sharded(
                        self.model, self.eval_params, self.mesh, thick,
                        self._next_key(), **patch_kw,
                    )
                else:
                    out = generate_volume(
                        self.model, self.eval_params, thick,
                        self._next_key(), **patch_kw,
                    )
                out = out[:, : d_orig * ratio]  # trim depth-bucket padding
                target = batch["target"][b : b + 1, : out.shape[1]]
                n = min(n_thin, out.shape[1])
                m = calculate_video_metrics(
                    from_model_range(np.asarray(out[:, :n])),
                    from_model_range(target[:, :n]),
                )
                psnrs.append(m["psnr"])
                ssims.append(m["ssim"])
                seen += 1
                if seen >= num_samples:
                    break
            if seen >= num_samples:
                break
        out = {}
        if psnrs:
            out = {"full_psnr": float(np.mean(psnrs)), "full_ssim": float(np.mean(ssims))}
            for k, v in out.items():
                self.writer.add_scalar(f"val/{k}", v, self.global_step)
        return out

    def final_validate(self) -> Dict[str, float]:
        """End-of-training comprehensive validation (reference :605-691)."""
        out = self.validate_patches(num_samples=10 ** 9, generate=True)
        out = {f"final_{k}": v for k, v in out.items()}
        for k, v in out.items():
            self.writer.add_scalar(f"val/{k}", v, self.global_step)
        return out

    # ----------------------------------------------------------- checkpoints
    def _ckpt_state(self):
        out = {"params": self.state.params, "opt_state": self.state.opt_state}
        if self.state.ema_params is not None:
            out["ema_params"] = self.state.ema_params
        return out

    def _metadata(self):
        return {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "micro_step": self._micro_step,
            "best_loss": self.best_loss,
            "current_phase": self.current_phase,
            "has_ema": self.state.ema_params is not None,
            "best_weights": self._last_best_weights,
            # UNet Conv3DBlock GroupNorm rule (ops/norm.py). The torch-parity
            # fix switched 128-ch conv blocks from 32 groups (adaptive rule)
            # to the reference's prefer-8 rule; parameter shapes are identical
            # so a pre-fix checkpoint restores silently but computes different
            # activations. Recording the rule lets restore detect that.
            "unet_norm_rule": "conv_prefer8",
            "config": self.config.to_dict(),
        }

    def save_checkpoint(self, name: str) -> str:
        path = os.path.join(self.ckpt_dir, name)
        save_checkpoint(path, self._ckpt_state(), self._metadata())
        self.logger.info("checkpoint saved: %s", path)
        return path

    def maybe_save_best(self, val_loss: float) -> None:
        """Best-checkpoint replace policy (reference trainer.py:757-771)."""
        if not np.isfinite(val_loss) or val_loss >= self.best_loss:
            return
        self.best_loss = val_loss
        new_path = self.save_checkpoint(
            f"checkpoint_best_epoch_{self.epoch:04d}{self.suffix}"
        )
        if self.best_ckpt_path and self.best_ckpt_path != new_path:
            shutil.rmtree(self.best_ckpt_path, ignore_errors=True)
        self.best_ckpt_path = new_path

    def load_checkpoint(self, path: str) -> None:
        """Resume params/opt_state/counters (reference trainer.py:809-912).

        Phase-aware: a phase-2 checkpoint's opt_state has live moments for
        the VAE groups, so the optimizer is rebuilt for phase 2 *before*
        restoring (the reference analogously re-freezes/unfreezes the VAE on
        resume, trainer.py:884-902).
        """
        import json as _json

        saved_meta = {}
        meta_path = os.path.join(path, "v2v_metadata.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                saved_meta = _json.load(f)
            saved_phase = int(saved_meta.get("current_phase", 1))
            if saved_phase != self.current_phase:
                self.set_phase(saved_phase)
            if saved_meta.get("unet_norm_rule", None) != "conv_prefer8":
                self.logger.warning(
                    "checkpoint %s has no unet_norm_rule metadata. If it was "
                    "trained before the Conv3DBlock GroupNorm parity fix "
                    "(prefer-8 rule, ops/norm.py:conv_block_num_groups), it "
                    "used 32 groups at 128 channels and will restore silently "
                    "(same param shapes) but compute different activations "
                    "than its original run", path,
                )
        target = self._ckpt_state()
        base = {"params": target["params"], "opt_state": target["opt_state"]}
        ema_enabled = "ema_params" in target
        ckpt_has_ema = saved_meta.get("has_ema")  # None for old checkpoints
        # Graceful EMA structure mismatch (reference analogue: non-strict
        # state-dict fallback, trainer.py:828-841): a checkpoint may have
        # been written with the opposite training.ema_decay setting. The
        # has_ema metadata flag picks the exact restore target; checkpoints
        # predating the flag fall back to try-both (never silently dropping
        # a real EMA tree on a transient first-attempt failure: the second
        # attempt only runs when the structures genuinely differ).
        ema_target = {**base, "ema_params": base["params"]}
        if ckpt_has_ema is True:
            attempts = [ema_target]
        elif ckpt_has_ema is False:
            attempts = [base]
        else:
            attempts = [target, base if ema_enabled else ema_target]
        restored = meta = None
        errs = []
        for tgt in attempts:
            try:
                restored, meta = load_checkpoint(path, target=jax.device_get(tgt))
                break
            except Exception as e:  # noqa: BLE001 — orbax raises various types
                errs.append(e)
        if restored is None:
            # raise the FIRST failure (the most informative one — later
            # attempts fail structurally by construction), chaining the rest
            raise errs[0] from (errs[-1] if len(errs) > 1 else None)
        ema = restored.get("ema_params") if ema_enabled else None
        if ema is None and ema_enabled:
            # EMA enabled but checkpoint predates it: seed from the params
            ema = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), restored["params"]
            )
            self.logger.info("checkpoint has no EMA state; seeded from params")
        self.state = TrainState(
            step=jnp.asarray(meta.get("micro_step", 0), jnp.int32),
            params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=ema,
        )
        if self.mesh is not None:
            self.state = self.state.replace(
                params=shard_params(self.state.params, self.mesh)
            )
            if self.state.ema_params is not None:
                self.state = self.state.replace(
                    ema_params=shard_params(self.state.ema_params, self.mesh)
                )
        self.epoch = int(meta.get("epoch", 0)) + 1
        self.global_step = int(meta.get("global_step", 0))
        self._micro_step = int(meta.get("micro_step", 0))
        self.best_loss = float(meta.get("best_loss", float("inf")))
        self.current_phase = int(meta.get("current_phase", 1))
        self.best_ckpt_path = path if "best" in os.path.basename(path) else None
        self.logger.info(
            "resumed from %s at epoch %d (step %d)", path, self.epoch, self.global_step
        )

    def reset_ema(self) -> None:
        """Reinitialize ema_params from the live params.

        For resuming checkpoints whose EMA predates decay warmup: a flat
        decay keeps decay^t of the random init in the average, so an early
        checkpoint's EMA scores the init, not the model (docs/RESULTS.md,
        round-2 EMA-warmup finding). No-op when EMA is disabled.
        """
        if self.state.ema_params is None:
            return
        self.state = self.state.replace(
            ema_params=jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), self.state.params
            )
        )
        self.logger.info("ema_params reset from live params")

    # ------------------------------------------------------------------ run
    def train(self) -> Dict[str, float]:
        t = self.config.training
        t_start = time.time()
        last: Dict[str, float] = {}
        p = self.config.pretrained
        for epoch in range(self.epoch, t.num_epochs):
            self.epoch = epoch
            if p.two_phase_training and epoch >= p.phase1_epochs:
                self.set_phase(2)
            elif (
                not p.two_phase_training
                and p.freeze_epochs > 0
                and epoch >= p.freeze_epochs
            ):
                # simple freeze mode (reference trainer.py:728-732): VAE
                # frozen for the first freeze_epochs epochs, then unfrozen
                self.set_phase(2)
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(epoch)
            stats = self.train_epoch()
            last["loss"] = stats["loss"]
            self.logger.info(
                "epoch %d: loss=%.5f data_t=%.1fs step_t=%.1fs",
                epoch, stats["loss"], stats["data_time"], stats["step_time"],
            )
            # Tier 1 every epoch
            self.validate_loss_only(max_batches=8)
            # Tier 2 cadence -> best checkpoint
            if t.patch_val_interval and (epoch + 1) % t.patch_val_interval == 0:
                tier2 = self.validate_patches()
                last.update(tier2)
                if "patch_loss" in tier2:
                    self.maybe_save_best(tier2["patch_loss"])
            # Tier 3 cadence
            if t.full_val_interval and (epoch + 1) % t.full_val_interval == 0:
                last.update(self.validate_full_volumes())
        self.save_checkpoint(f"checkpoint_final_epoch_{self.epoch:04d}{self.suffix}")
        if t.final_val_enabled and self.val_loader is not None:
            last.update(self.final_validate())
        self.logger.info("training done in %.1fs", time.time() - t_start)
        return last
