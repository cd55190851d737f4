"""Standalone preprocessing CLI: DICOM archive -> npz tensor cache.

Rebuild of the reference's preprocessing entry points (the live path in
data/slice_interpolation_dataset.py:254-409 plus the standalone
scripts/preprocess_dataset.py). Unlike the reference's legacy script (which
emitted a *different* uint8 cache format), this always produces the single
cache format the datasets consume. With --synthetic N it generates phantom
patients instead of reading DICOMs.

Usage:
  python scripts/preprocess_dataset.py --config slice_interpolation_full_medium
  python scripts/preprocess_dataset.py --processed-dir cache/ --synthetic 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_to_video_diffusion_tpu.config import load_config
from video_to_video_diffusion_tpu.data.datasets import (
    ensure_synthetic_cache,
    preprocess_all_patients,
)
from video_to_video_diffusion_tpu.utils.logger import setup_logger


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--dataset-path", default=None)
    ap.add_argument("--processed-dir", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    args = ap.parse_args(argv)
    logger = setup_logger("preprocess")

    cfg = load_config(args.config) if args.config else load_config({})
    d = cfg.data
    overrides = {}
    if args.dataset_path:
        overrides["dataset_path"] = args.dataset_path
    if args.processed_dir:
        overrides["processed_dir"] = args.processed_dir
    if args.synthetic:
        overrides["synthetic_num_patients"] = args.synthetic
    if overrides:
        raw = cfg.to_dict()
        raw["data"].update(overrides)
        cfg = load_config(raw)
        d = cfg.data

    if d.synthetic_num_patients:
        files = ensure_synthetic_cache(
            d.processed_dir,
            d.synthetic_num_patients,
            thin_depth=d.synthetic_thin_depth,
            height=d.synthetic_height,
            width=d.synthetic_width,
            seed=d.seed,
        )
        logger.info("synthetic cache: %d patients in %s", len(files), d.processed_dir)
    else:
        files = preprocess_all_patients(d, logger=logger)
        logger.info("preprocessed %d cases into %s", len(files), d.processed_dir)
    print(json.dumps({"num_cases": len(files), "processed_dir": d.processed_dir}))
    return files


if __name__ == "__main__":
    main()
