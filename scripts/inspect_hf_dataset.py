"""List the APE-data HuggingFace repo contents (reference scripts/inspect_hf_dataset.py).

Requires network + huggingface_hub (unavailable in the zero-egress build env).
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict

REPO_ID = "t2ance/APE-data"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo-id", default=REPO_ID)
    args = ap.parse_args(argv)
    try:
        from huggingface_hub import HfApi
    except ImportError:
        print("huggingface_hub not installed (offline build env)", file=sys.stderr)
        return 1
    files = HfApi().list_repo_files(args.repo_id, repo_type="dataset")
    by_cat = defaultdict(list)
    for f in files:
        m = re.match(r"([^/]+)/.*?(\d+)\.zip$", f)
        if m:
            by_cat[m.group(1)].append(int(m.group(2)))
    for cat, nums in sorted(by_cat.items()):
        print(f"{cat}: {len(nums)} cases, numbers {min(nums)}..{max(nums)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
