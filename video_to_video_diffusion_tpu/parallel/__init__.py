from video_to_video_diffusion_tpu.parallel.mesh import make_mesh  # noqa: F401
from video_to_video_diffusion_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_partition_specs,
    replicate,
    shard_batch,
    shard_params,
)
