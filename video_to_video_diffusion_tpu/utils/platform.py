"""Platform selection helper.

`hardware.device: cpu` in a config must win even when a TPU plugin
force-registers itself via sitecustomize (this build env's axon plugin sets
JAX_PLATFORMS=axon before user code runs). Call this before the first jax
computation.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = os.environ.get(
    "V2V_COMPILATION_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
)


def configure_platform(device: str) -> None:
    device = (device or "").lower()
    import jax

    if device in ("cpu",):
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    # 'tpu'/'auto'/anything else: leave the default platform resolution alone.


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache — TPU compiles of the medium UNet
    take minutes; caching makes every subsequent process start instant."""
    import jax

    cache_dir = cache_dir or _DEFAULT_CACHE
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
