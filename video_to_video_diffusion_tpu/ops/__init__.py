from video_to_video_diffusion_tpu.ops.conv import conv3d, conv3d_transpose  # noqa: F401
from video_to_video_diffusion_tpu.ops.norm import group_norm  # noqa: F401
from video_to_video_diffusion_tpu.ops.resize import (  # noqa: F401
    resize_trilinear,
    resize_nearest,
)
from video_to_video_diffusion_tpu.ops.layout import (  # noqa: F401
    ncdhw_to_ndhwc,
    ndhwc_to_ncdhw,
)
from video_to_video_diffusion_tpu.ops.precision import Policy  # noqa: F401
