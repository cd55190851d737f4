"""Mixed-precision policy for TPU training.

The reference relies on `torch.cuda.amp` autocast + GradScaler
(training/trainer.py:221-234). On TPU, bf16 has the same exponent range as
f32, so no loss scaling is needed: the policy here is params in f32, compute
in bf16, norm statistics and loss reductions in f32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        def _cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x

        return jax.tree_util.tree_map(_cast, tree)

    @staticmethod
    def from_precision(name: str) -> "Policy":
        name = (name or "f32").lower()
        if name in ("bf16", "bfloat16", "mixed_bfloat16"):
            return Policy(compute_dtype=jnp.bfloat16)
        if name in ("f32", "fp32", "float32"):
            return Policy(compute_dtype=jnp.float32)
        raise ValueError(f"unknown precision {name!r} (use 'bf16' or 'f32')")
