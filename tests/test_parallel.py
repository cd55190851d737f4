"""Mesh/sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from video_to_video_diffusion_tpu.parallel.mesh import DATA_AXIS, TENSOR_AXIS, make_mesh
from video_to_video_diffusion_tpu.parallel.sharding import (
    batch_sharding,
    param_partition_specs,
    shard_batch,
    shard_params,
)


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh(8, tensor_parallel=2)
    assert dict(mesh.shape) == {DATA_AXIS: 4, TENSOR_AXIS: 2}
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {DATA_AXIS: 8, TENSOR_AXIS: 1}
    with pytest.raises(AssertionError):
        make_mesh(6, tensor_parallel=4)


def test_param_partition_rules():
    mesh = make_mesh(8, tensor_parallel=2)
    params = {
        "big_kernel": jnp.zeros((3, 3, 3, 16, 256)),
        "small_kernel": jnp.zeros((3, 3, 3, 4, 6)),
        "bias": jnp.zeros((256,)),
    }
    specs = param_partition_specs(params, mesh, min_shard_size=128)
    assert specs["big_kernel"] == P(None, None, None, None, TENSOR_AXIS)
    assert specs["small_kernel"] == P()
    assert specs["bias"] == P()
    # tp=1 -> all replicated
    mesh1 = make_mesh(8, tensor_parallel=1)
    specs1 = param_partition_specs(params, mesh1)
    assert all(s == P() for s in jax.tree_util.tree_leaves(specs1))


def test_shard_params_and_batch_placement():
    mesh = make_mesh(8, tensor_parallel=2)
    params = {"k": jnp.zeros((3, 3, 3, 8, 256))}
    sharded = shard_params(params, mesh)
    assert sharded["k"].sharding.spec == P(None, None, None, None, TENSOR_AXIS)
    batch = shard_batch({"input": np.zeros((8, 2, 4, 4, 1), np.float32)}, mesh)
    assert batch["input"].sharding.spec == P(DATA_AXIS)


def test_data_parallel_loss_matches_single_device():
    """A psum-reduced DP loss must equal the single-device loss."""
    mesh = make_mesh(8, tensor_parallel=1)
    x = np.random.default_rng(0).standard_normal((8, 16)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal((16, 4)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    single = float(jax.jit(loss)(w, x))
    xw = jax.device_put(x, batch_sharding(mesh))
    ww = jax.device_put(w, NamedSharding(mesh, P()))
    dist = float(jax.jit(loss)(ww, xw))
    np.testing.assert_allclose(dist, single, rtol=1e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
