"""Train state and optimizer construction.

Rebuild of the reference's optimizer plumbing (training/train.py:166-229):
layer-wise learning-rate multipliers per parameter group (vae_encoder /
vae_decoder / unet) become an `optax.multi_transform`; multiplier 0.0 freezes
the group with `optax.set_to_zero` (the functional analogue of
requires_grad=False, which also skips its Adam moments). Gradient
accumulation is `optax.MultiSteps` (reference trainer.py:236-247); bf16 on
TPU needs no GradScaler.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from video_to_video_diffusion_tpu.config import Config


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # micro-steps (MultiSteps inner counter mirrors this)
    params: Any
    opt_state: Any
    # Exponential moving average of params (None when EMA is disabled).
    # Beyond the reference: standard diffusion practice — sampling from the
    # EMA weights smooths late-training oscillation.
    ema_params: Any = None


def param_group_label(path: Tuple, _leaf=None) -> str:
    """vae_encoder / vae_decoder / unet label from a param path.

    Mirrors the reference's name-prefix grouping (training/train.py:178-206).
    """
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if keys and keys[0] == "vae":
        return "vae_encoder" if "encoder" in keys[1:2] else "vae_decoder"
    return "unet"


def make_optimizer(
    cfg: Config,
    params: Any,
    total_steps: int,
    steps_per_epoch: int = 1,
    lr_multipliers: Optional[Dict[str, float]] = None,
) -> Tuple[optax.GradientTransformation, Callable]:
    """(optimizer, lr_schedule_fn).

    The schedule counts optimizer (post-accumulation) steps.
    """
    from video_to_video_diffusion_tpu.training.schedule import get_schedule

    t = cfg.training
    if lr_multipliers is None:
        lr_multipliers = {
            "vae_encoder": cfg.pretrained.lr_mult_vae_encoder,
            "vae_decoder": cfg.pretrained.lr_mult_vae_decoder,
            "unet": cfg.pretrained.lr_mult_unet,
        }
    # The schedule ticks once per OPTIMIZER step (optax.MultiSteps advances
    # the inner transform every k micro-steps), so warmup must be expressed
    # in optimizer steps too — micro-step warmup would stretch it by the
    # accumulation factor.
    accum = max(t.gradient_accumulation_steps, 1)
    schedule = get_schedule(
        t.scheduler,
        t.learning_rate,
        total_steps=max(total_steps, 1),
        warmup_steps=t.warmup_epochs * steps_per_epoch // accum,
        min_lr=t.min_lr,
    )

    def base_opt(mult: float) -> optax.GradientTransformation:
        if mult == 0.0:
            return optax.set_to_zero()
        scaled = lambda step: schedule(step) * mult
        if t.optimizer.lower() == "adamw":
            opt = optax.adamw(scaled, weight_decay=t.weight_decay)
        elif t.optimizer.lower() == "adam":
            opt = optax.adam(scaled)
        else:
            raise ValueError(f"Unknown optimizer: {t.optimizer}")
        return opt

    labels = jax.tree_util.tree_map_with_path(param_group_label, params)
    groups = {name: base_opt(mult) for name, mult in lr_multipliers.items()}
    tx = optax.chain(
        optax.clip_by_global_norm(t.max_grad_norm) if t.max_grad_norm else optax.identity(),
        optax.multi_transform(groups, labels),
    )
    if t.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=t.gradient_accumulation_steps)
    return tx, schedule


def create_train_state(
    params: Any, tx: optax.GradientTransformation, ema: bool = False
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        # explicit copy: sharing buffers with params breaks jit donation
        ema_params=(
            jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
            if ema
            else None
        ),
    )


def make_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.0,
    accum_steps: int = 1,
):
    """Build a jittable train step.

    loss_fn(params, batch, key) -> (loss, metrics dict); a loss_fn declaring
    a 4th `step` parameter additionally receives the traced OPTIMIZER-step
    index (state.step // accum_steps) so every-N-step gated aux losses fire
    for ALL micro-batches of a gated optimizer step — gating on the raw
    micro-step counter would down-weight one micro-batch's diffusion
    gradient relative to its accumulation peers and shrink the effective
    aux weight to ~lambda/accum (same micro- vs optimizer-step confusion
    the VAE LR log had). The returned step
    computes grads, applies the (possibly accumulating) optimizer, and
    reports loss + global grad norm. With a ('data',)-sharded batch under
    jit, XLA inserts the gradient psum automatically.

    ema_decay > 0 maintains state.ema_params <- d*ema + (1-d)*params, gated
    to accumulation boundaries (pass accum_steps = the MultiSteps factor):
    applying the decay every micro-step would compound it to d^accum per
    optimizer update, so literature decay values would mis-transfer.

    The decay is warmed up as d_t = min(ema_decay, (1+t)/(10+t)) over
    optimizer steps t: a flat d=0.999 leaves 0.999^t of the random init in
    the average (39% after ~900 steps — measured as a 10 dB eval on an
    otherwise healthy run), so early best-checkpoints would score the init,
    not the model. The warmup keeps the effective horizon ~t/10 until it
    reaches the configured decay.
    """

    import inspect

    wants_step = "step" in inspect.signature(loss_fn).parameters

    def train_step(state: TrainState, batch: Dict, key: jax.Array):
        def loss_wrapped(p):
            if wants_step:
                opt_step = state.step // max(accum_steps, 1)
                return loss_fn(p, batch, key, step=opt_step)
            return loss_fn(p, batch, key)

        (loss, metrics), grads = jax.value_and_grad(loss_wrapped, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if ema_decay > 0.0 and state.ema_params is not None:
            at_boundary = (state.step + 1) % max(accum_steps, 1) == 0
            opt_step = ((state.step + 1) // max(accum_steps, 1)).astype(jnp.float32)
            warm = (1.0 + opt_step) / (10.0 + opt_step)
            d_eff = jnp.minimum(jnp.float32(ema_decay), warm)
            d = jnp.where(at_boundary, d_eff, jnp.float32(1.0))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: (d * e.astype(jnp.float32)
                              + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
                state.ema_params,
                new_params,
            )
        else:
            new_ema = state.ema_params
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                ema_params=new_ema,
            ),
            metrics,
        )

    return train_step
