from video_to_video_diffusion_tpu.inference.sampler import (  # noqa: F401
    DDIMSampler,
    DDPMSampler,
    ddim_sample,
    ddim_timesteps,
    ddpm_sample,
    gaussian_weight_3d,
    sample_with_stitching,
    stitch_positions,
)
