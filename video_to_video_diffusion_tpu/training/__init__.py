from video_to_video_diffusion_tpu.training.schedule import get_schedule  # noqa: F401
from video_to_video_diffusion_tpu.training.state import (  # noqa: F401
    TrainState,
    make_optimizer,
)
from video_to_video_diffusion_tpu.training.trainer import Trainer  # noqa: F401
