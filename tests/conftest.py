"""Test configuration: force an 8-virtual-device CPU mesh.

TPU hardware may be visible through the axon platform, but tests must be
deterministic and runnable anywhere, and multi-chip sharding is validated on
a virtual 8-device CPU mesh (the driver separately dry-runs multichip via
__graft_entry__.dryrun_multichip).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
