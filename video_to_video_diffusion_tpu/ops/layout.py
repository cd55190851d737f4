"""Layout adapters between the reference's NCDHW and our native NDHWC.

The torch reference uses (B, C, T, H, W) throughout (e.g. models/vae.py:104).
On TPU the trailing two dims map onto (sublane x lane) vector registers, so
channels-last (B, D, H, W, C) keeps the channel contraction of every conv on
the MXU's fast axis. These helpers live at the API boundary only — internals
never transpose.
"""

import jax.numpy as jnp


def ncdhw_to_ndhwc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, D, H, W) -> (B, D, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def ndhwc_to_ncdhw(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, C, D, H, W)."""
    return jnp.transpose(x, (0, 4, 1, 2, 3))
