from video_to_video_diffusion_tpu.models.diffusion import (  # noqa: F401
    DiffusionSchedule,
    make_schedule,
    q_sample,
    predict_z0_from_noise,
    min_snr_weight,
    diffusion_training_loss,
)
from video_to_video_diffusion_tpu.models.vae import SliceInterpolationVAE, VideoVAE  # noqa: F401
from video_to_video_diffusion_tpu.models.unet3d import UNet3D  # noqa: F401
from video_to_video_diffusion_tpu.models.model import VideoToVideoDiffusion  # noqa: F401
