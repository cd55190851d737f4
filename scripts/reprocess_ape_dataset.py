"""Re-run preprocessing for previously failed cases.

Rebuild of scripts/reprocess_ape_dataset.py: parse
processed_dir/preprocessing_failures.txt, summarize failure causes, and
re-attempt each failed case (fixed archives, transient IO, ...).

Usage: python scripts/reprocess_ape_dataset.py --config <cfg> [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_to_video_diffusion_tpu.config import load_config
from video_to_video_diffusion_tpu.data.datasets import preprocess_case
from video_to_video_diffusion_tpu.utils.logger import setup_logger


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)
    logger = setup_logger("reprocess")

    cfg = load_config(args.config).data
    report = os.path.join(cfg.processed_dir or ".", "preprocessing_failures.txt")
    if not os.path.exists(report):
        print(json.dumps({"failures": 0, "recovered": 0}))
        return
    with open(report) as f:
        lines = [l.strip() for l in f if l.strip()]
    cases = {}
    causes = Counter()
    for line in lines:
        path, _, err = line.partition(": ")
        cases[path] = err
        causes[err.split(":")[0]] += 1
    logger.info("failure causes: %s", dict(causes))
    recovered = 0
    if not args.dry_run:
        for path in cases:
            case_id = os.path.splitext(os.path.basename(path))[0]
            cat = os.path.basename(os.path.dirname(path))
            out = os.path.join(cfg.processed_dir, f"{cat}__{case_id}.npz")
            try:
                preprocess_case(path, out, cfg.window_center, cfg.window_width, cfg.target_size)
                recovered += 1
            except Exception as e:  # noqa: BLE001
                logger.warning("still failing: %s (%s)", path, e)
        if recovered:
            os.rename(report, report + ".old")
    print(json.dumps({"failures": len(cases), "recovered": recovered, "causes": dict(causes)}))


if __name__ == "__main__":
    main()
