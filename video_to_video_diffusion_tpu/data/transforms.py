"""Video transforms and IO helpers (legacy video path).

Rebuild of data/transforms.py in the reference (:18-220): resize +
[-1,1] normalization, paired augmentation, denormalization, and
video<->numpy helpers. The CT training path does not use these (it goes
through data/windowing.py); they support inference/generate.py and the
legacy video framing. IO uses imageio when available.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from video_to_video_diffusion_tpu.data.windowing import resize_slices


class VideoTransform:
    """Resize frames and normalize to [-1, 1] (reference transforms.py:18-82).

    __call__ takes (D, H, W) or (D, H, W, C) uint8/float frames and returns
    float32 (D, h, w, C) in [-1, 1].
    """

    def __init__(self, size: Tuple[int, int] = (256, 256)):
        self.size = tuple(size)

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        if frames.ndim == 3:
            frames = frames[..., None]
        if frames.dtype == np.uint8:
            frames = frames.astype(np.float32) / 255.0
        else:
            frames = frames.astype(np.float32)
        out = np.stack(
            [
                np.stack(
                    [resize_slices(frames[:, :, :, c][d : d + 1], self.size)[0]
                     for c in range(frames.shape[-1])],
                    axis=-1,
                )
                for d in range(frames.shape[0])
            ]
        )
        return out * 2.0 - 1.0


class VideoAugmentation:
    """Paired random horizontal flip (reference transforms.py:84-127)."""

    def __init__(self, p_flip: float = 0.5, seed: int = 0):
        self.p_flip = p_flip
        self.rng = np.random.default_rng(seed)

    def __call__(self, *videos: np.ndarray) -> Sequence[np.ndarray]:
        if self.rng.random() < self.p_flip:
            videos = tuple(np.ascontiguousarray(v[:, :, ::-1]) for v in videos)
        return videos if len(videos) > 1 else videos[0]


class DenormalizeVideo:
    """[-1, 1] -> [0, 1] (reference transforms.py:129-147)."""

    def __call__(self, video: np.ndarray) -> np.ndarray:
        return np.clip((video.astype(np.float32) + 1.0) / 2.0, 0.0, 1.0)


def video_to_numpy(video) -> np.ndarray:
    """Any array-like (incl. jax) NDHWC video -> float numpy (reference :149-168)."""
    return np.asarray(video)


def save_video(video: np.ndarray, path: str, fps: int = 8) -> None:
    """Save an NDHWC [-1,1] or [0,1] video to disk (reference :170-198).

    .npy/.npz always work; .mp4/.gif require imageio.
    """
    arr = np.asarray(video)
    if arr.ndim == 5:
        arr = arr[0]
    if path.endswith(".npy"):
        np.save(path, arr)
        return
    if path.endswith(".npz"):
        np.savez_compressed(path, video=arr)
        return
    import imageio

    lo, hi = float(arr.min()), float(arr.max())
    frames01 = (arr - lo) / (hi - lo + 1e-8) if lo < 0 else np.clip(arr, 0, 1)
    frames = (frames01 * 255).astype(np.uint8)
    if frames.shape[-1] == 1:
        frames = frames[..., 0]
    imageio.mimsave(path, list(frames), fps=fps)


def load_video(path: str) -> np.ndarray:
    """Load a video file into (D, H, W, C) float32 (reference :200-220)."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".npz"):
        with np.load(path) as z:
            key = "video" if "video" in z else list(z.keys())[0]
            return z[key].astype(np.float32)
    import imageio

    frames = np.stack(list(imageio.mimread(path)), axis=0).astype(np.float32) / 255.0
    if frames.ndim == 3:
        frames = frames[..., None]
    return frames
