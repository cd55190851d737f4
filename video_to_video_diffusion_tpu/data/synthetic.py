"""Synthetic CT phantom generator.

The reference trains on the APE CT archive (~50 GB, HuggingFace t2ance/APE-data,
scripts/download_ape_dataset.py). That dataset isn't shippable with the
framework, so this module generates anatomically-flavored 3D phantoms —
smooth ellipsoid "organs", a body cylinder, vessel-like tubes and noise, in
HU units — and derives a paired thick/thin acquisition by block-averaging the
thin stack (thick 5.0 mm = mean of 5 adjacent 1.0 mm slices). Every pipeline
stage, test and benchmark can run on it end-to-end.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def synthetic_hu_volume(
    rng: np.random.Generator,
    depth: int = 60,
    height: int = 128,
    width: int = 128,
    noise_sigma: float = 8.0,
) -> np.ndarray:
    """A (D, H, W) float32 HU phantom in roughly [-1000, 400]."""
    z = np.linspace(-1, 1, depth)[:, None, None]
    y = np.linspace(-1, 1, height)[None, :, None]
    x = np.linspace(-1, 1, width)[None, None, :]

    vol = np.full((depth, height, width), -1000.0, np.float32)  # air
    body = (x ** 2 / 0.8 ** 2 + y ** 2 / 0.9 ** 2) < 1.0
    vol = np.where(np.broadcast_to(body, vol.shape), 40.0, vol)  # soft tissue

    # ellipsoid organs with random HU offsets
    for _ in range(int(rng.integers(3, 7))):
        cz, cy, cx = rng.uniform(-0.5, 0.5, 3)
        rz, ry, rx = rng.uniform(0.15, 0.45, 3)
        hu = rng.uniform(-120, 240)
        e = ((z - cz) / rz) ** 2 + ((y - cy) / ry) ** 2 + ((x - cx) / rx) ** 2
        vol = np.where(e < 1.0, vol + hu * np.exp(-e).astype(np.float32), vol)

    # vessel-like bright tubes along depth
    for _ in range(int(rng.integers(2, 5))):
        cy, cx = rng.uniform(-0.6, 0.6, 2)
        r = rng.uniform(0.02, 0.06)
        wobble = 0.1 * np.sin(np.linspace(0, rng.uniform(2, 6) * np.pi, depth))
        tube = ((y - (cy + wobble[:, None, None])) ** 2 + (x - cx) ** 2) < r ** 2
        vol = np.where(tube & body, 300.0, vol)

    # acquisition noise, drawn LAST so noise_sigma=0 reproduces the same
    # anatomy from the same seed (used by scripts/compute_noise_ceiling.py
    # to measure the noise-imposed PSNR ceiling)
    if noise_sigma > 0:
        vol += rng.normal(0, noise_sigma, vol.shape).astype(np.float32)
    return vol.astype(np.float32)


def thick_from_thin(thin: np.ndarray, ratio: int = 5) -> np.ndarray:
    """Simulate thick-slice acquisition: mean over `ratio` adjacent thin slices.

    (5.0 mm slices from 1.0 mm — the task geometry in README.md:5-11.)
    """
    D = (thin.shape[0] // ratio) * ratio
    return thin[:D].reshape(-1, ratio, *thin.shape[1:]).mean(axis=1)


def synthetic_patient_pair(
    seed: int,
    thin_depth: int = 60,
    height: int = 128,
    width: int = 128,
    thick_ratio: int = 5,
    noise_sigma: float = 8.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(thick_hu (D/r, H, W), thin_hu (D, H, W)) for one synthetic patient."""
    rng = np.random.default_rng(seed)
    thin = synthetic_hu_volume(rng, thin_depth, height, width, noise_sigma)
    thick = thick_from_thin(thin, thick_ratio)
    return thick, thin
