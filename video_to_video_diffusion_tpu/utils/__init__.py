from video_to_video_diffusion_tpu.utils.metrics import (  # noqa: F401
    calculate_psnr,
    calculate_ssim,
    calculate_video_metrics,
)
from video_to_video_diffusion_tpu.utils.logger import setup_logger  # noqa: F401
