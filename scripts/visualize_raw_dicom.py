"""Raw DICOM series inspector (reference scripts/visualize_raw_dicom.py).

Reports per-series slice count, z-spacing, slice thickness and HU stats to
characterize the anisotropic-SR task, and optionally saves a montage PNG.

Usage: python scripts/visualize_raw_dicom.py --series <dicom dir> [--png out.png]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from video_to_video_diffusion_tpu.data.dicom import load_dicom_volume, read_dicom_slice


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--series", required=True)
    ap.add_argument("--png", default=None)
    args = ap.parse_args(argv)

    vol, thickness = load_dicom_volume(args.series)
    zs = []
    for f in sorted(os.listdir(args.series)):
        try:
            zs.append(read_dicom_slice(os.path.join(args.series, f)).z_position)
        except Exception:
            continue
    zs = sorted(zs)
    spacing = float(np.median(np.diff(zs))) if len(zs) > 1 else float("nan")
    info = {
        "num_slices": int(vol.shape[0]),
        "rows": int(vol.shape[1]),
        "cols": int(vol.shape[2]),
        "slice_thickness_mm": thickness,
        "z_spacing_mm": spacing,
        "hu_min": float(vol.min()),
        "hu_max": float(vol.max()),
        "hu_mean": float(vol.mean()),
    }
    print(json.dumps(info, indent=2))
    if args.png:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = min(vol.shape[0], 9)
        idxs = np.linspace(0, vol.shape[0] - 1, n).astype(int)
        fig, axes = plt.subplots(3, 3, figsize=(9, 9))
        for ax, i in zip(axes.ravel(), idxs):
            ax.imshow(vol[i], cmap="gray")
            ax.set_title(f"z={i}")
            ax.axis("off")
        fig.savefig(args.png, dpi=90)
    return info


if __name__ == "__main__":
    main()
