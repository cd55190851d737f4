"""video_to_video_diffusion_tpu — TPU-native CT slice-interpolation latent diffusion.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch repo `Kkuntal990/video-to-video-diffusion` (CT anisotropic
super-resolution: 8 thick 5.0 mm slices -> 48 thin 1.0 mm slices via latent
diffusion: 3D VAE + conditional 3D UNet + DDPM/DDIM samplers + sliding-window
Gaussian-blended stitching).

Design contract (TPU-first, differs deliberately from the torch reference):
  * Tensor layout is channels-last NDHWC: (B, D, H, W, C). XLA/TPU tiles the
    trailing (W, C) dims onto (sublane, lane); channels-last keeps convs and
    elementwise ops MXU/VPU friendly. Adapters for the reference's NCDHW
    layout live in `utils.layout`.
  * All hot paths are pure jittable functions with static shapes; sampling
    loops are `lax.scan`s; randomness is explicit `jax.random` key threading.
  * Multi-chip scaling uses `jax.sharding.Mesh` (data/tensor axes) + XLA
    collectives — see `parallel/`.
  * Mixed precision is bf16 compute / f32 params+norms (no GradScaler: bf16
    needs no loss scaling on TPU).
"""

__version__ = "0.1.0"

from video_to_video_diffusion_tpu.config import load_config  # noqa: F401
