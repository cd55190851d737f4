from video_to_video_diffusion_tpu.data.loader import (  # noqa: F401
    get_dataloader,
    get_unified_dataloader,
)
from video_to_video_diffusion_tpu.data.datasets import (  # noqa: F401
    PatchSliceInterpolationDataset,
    SliceInterpolationDataset,
    collate_variable_depth,
)
from video_to_video_diffusion_tpu.data.windowing import apply_ct_windowing  # noqa: F401
