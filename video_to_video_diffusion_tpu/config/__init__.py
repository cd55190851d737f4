from video_to_video_diffusion_tpu.config.schema import (  # noqa: F401
    Config,
    DataConfig,
    HardwareConfig,
    LossConfig,
    ModelConfig,
    PretrainedConfig,
    TrainingConfig,
    load_config,
    preset_path,
)
