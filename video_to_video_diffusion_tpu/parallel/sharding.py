"""Sharding rules: batch over 'data', wide weights over 'tensor'.

XLA's SPMD partitioner inserts the collectives (all-gather on sharded-weight
convs, psum on data-parallel grads) — we only annotate placements, per the
scaling-book recipe: pick a mesh, annotate shardings, let XLA do the rest.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_to_video_diffusion_tpu.parallel.mesh import DATA_AXIS, TENSOR_AXIS


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_partition_specs(
    params: Any,
    mesh: Mesh,
    min_shard_size: int = 128,
) -> Any:
    """Megatron-lite weight partitioning.

    Rule: any >=2-D kernel whose trailing (out-feature) dim is divisible by
    the tensor-axis size and at least `min_shard_size` is sharded on that dim
    over 'tensor'; everything else (biases, norm scales, small kernels) is
    replicated. With tensor_parallel=1 this degenerates to full replication
    (pure data parallelism — the right default at reference model sizes).
    """
    tp = mesh.shape[TENSOR_AXIS]

    def spec_for(x) -> P:
        if tp <= 1 or x.ndim < 2:
            return P()
        out_dim = x.shape[-1]
        if out_dim % tp == 0 and out_dim >= min_shard_size:
            return P(*([None] * (x.ndim - 1)), TENSOR_AXIS)
        return P()

    return jax.tree_util.tree_map(spec_for, params)


def shard_params(params: Any, mesh: Mesh, specs: Any = None) -> Any:
    """Place a param pytree on the mesh per `specs` (or the default rules)."""
    if specs is None:
        specs = param_partition_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


_warned_replicated_keys = set()


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put a host batch with the leading axis split over 'data'.

    Arrays whose leading axis is not divisible by the 'data' mesh axis (e.g.
    a short validation batch, or a last partial batch without drop_last) are
    replicated instead — correct, just not data-parallel for that batch.
    The fallback warns once per (key, leading-dim) so a benign short final
    validation batch doesn't consume the only warning: if EVERY training
    batch hits it (batch_size not divisible by the data-axis size), training
    silently runs fully replicated, which is a configuration error worth
    surfacing.
    """
    import logging

    sh = batch_sharding(mesh)
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    n_data = mesh.shape[DATA_AXIS]

    def put(k, v):
        if not hasattr(v, "shape"):
            return v
        fits = v.ndim >= 1 and v.shape[0] % n_data == 0
        warn_key = (k, v.shape[0] if v.ndim else 0)
        if not fits and warn_key not in _warned_replicated_keys:
            _warned_replicated_keys.add(warn_key)
            logging.getLogger("sharding").warning(
                "batch array %r (leading dim %d) is not divisible by the "
                "'data' mesh axis (%d); replicating it. If this happens for "
                "every training batch, set data.batch_size to a multiple of "
                "the data-axis size.",
                k, v.shape[0] if v.ndim else 0, n_data,
            )
        return jax.device_put(v, sh if fits else repl)

    return {k: put(k, v) for k, v in batch.items()}
