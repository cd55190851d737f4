"""Pallas TPU kernels (fused GroupNorm+SiLU, fused depth attention).

Kernels are enabled on TPU backends via `enable_pallas()`; every kernel has
a pure-jnp fallback and an interpret-mode path so correctness is tested on
CPU.
"""

from __future__ import annotations

import jax


def enable_pallas() -> bool:
    """Turn on Pallas dispatch for supported ops if running on TPU."""
    from video_to_video_diffusion_tpu.ops import attention as _attention

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    _attention.set_use_pallas(on_tpu)
    return on_tpu
