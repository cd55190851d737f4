"""Device-mesh construction.

The reference is single-GPU with no distributed code at all (SURVEY.md §2.8);
this module is the TPU-native scaling layer it lacks: a `jax.sharding.Mesh`
over the visible chips with two logical axes:

  * 'data'   — batch / patch-grid parallelism (the dominant axis here: the
               8->48 patch is the natural unit of work; gradients reduce with
               psum over ICI),
  * 'tensor' — Megatron-style sharding of the widest conv/dense out-channels
               for models too large to replicate (optional; defaults to 1
               since the ~0.3-0.7B reference-scale models replicate fine).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
TENSOR_AXIS = "tensor"


def make_mesh(
    num_devices: int = 0,
    tensor_parallel: int = 1,
    devices: Optional[Sequence] = None,
    data_parallel: int = 0,
) -> Mesh:
    """Build a ('data', 'tensor') mesh.

    Args:
      num_devices: total devices to use (0 = all visible).
      tensor_parallel: size of the tensor axis; must divide num_devices.
      data_parallel: size of the data axis (0 = infer as n // tensor_parallel;
        hardware.mesh_data_axis). When given, data*tensor devices are used.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if data_parallel:
        num_devices = data_parallel * tensor_parallel
        assert num_devices <= len(devs), (
            f"mesh {data_parallel}x{tensor_parallel} needs {num_devices} "
            f"devices, have {len(devs)}"
        )
    if num_devices:
        devs = devs[:num_devices]
    n = len(devs)
    assert n % tensor_parallel == 0, (
        f"{n} devices not divisible by tensor_parallel={tensor_parallel}"
    )
    arr = np.array(devs).reshape(n // tensor_parallel, tensor_parallel)
    return Mesh(arr, (DATA_AXIS, TENSOR_AXIS))
