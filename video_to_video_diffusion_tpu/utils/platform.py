"""Platform selection helper.

`hardware.device: cpu` in a config must win even when a TPU plugin
force-registers itself via sitecustomize (this build env's axon plugin sets
JAX_PLATFORMS=axon before user code runs). Call this before the first jax
computation.
"""

from __future__ import annotations

import os


def configure_platform(device: str) -> None:
    device = (device or "").lower()
    import jax

    if device in ("cpu",):
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    # 'tpu'/'auto'/anything else: leave the default platform resolution alone.
