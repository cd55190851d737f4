"""Learning-rate schedules (optax).

Rebuild of the reference's epoch-level schedulers (training/scheduler.py:12-106)
as step-based optax schedules: 'cosine' = linear warmup then cosine annealing
to min_lr; 'linear' decay; 'constant'.
"""

from __future__ import annotations

import optax


def get_schedule(
    name: str,
    learning_rate: float,
    total_steps: int,
    warmup_steps: int = 0,
    min_lr: float = 1e-6,
):
    """Return an optax schedule fn mapping step -> lr."""
    name = (name or "cosine").lower()
    warmup_steps = min(warmup_steps, max(total_steps - 1, 1))
    if name == "cosine":
        decay_steps = max(total_steps - warmup_steps, 1)
        if warmup_steps > 0:
            return optax.warmup_cosine_decay_schedule(
                init_value=learning_rate * 0.01,
                peak_value=learning_rate,
                warmup_steps=warmup_steps,
                decay_steps=total_steps,
                end_value=min_lr,
            )
        return optax.cosine_decay_schedule(
            init_value=learning_rate,
            decay_steps=decay_steps,
            alpha=min_lr / learning_rate,
        )
    if name == "linear":
        return optax.linear_schedule(
            init_value=learning_rate,
            end_value=min_lr,
            transition_steps=max(total_steps, 1),
        )
    if name == "constant":
        return optax.constant_schedule(learning_rate)
    raise ValueError(f"Unknown scheduler: {name}")
