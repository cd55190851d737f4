"""APE dataset downloader (HuggingFace t2ance/APE-data).

Rebuild of scripts/download_ape_dataset.py: bulk-download the APE/ and
non-APE/ case ZIPs with resume/skip logic. Requires `huggingface_hub` and
network access; fails with a clear message otherwise (this build environment
is zero-egress, so the synthetic cache is the offline substitute —
scripts/preprocess_dataset.py --synthetic N).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO_ID = "t2ance/APE-data"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--output-dir", default="APE-data")
    ap.add_argument("--categories", nargs="+", default=["APE", "non-APE"])
    ap.add_argument("--max-cases", type=int, default=0)
    args = ap.parse_args(argv)

    try:
        from huggingface_hub import HfApi, hf_hub_download
    except ImportError:
        print(
            "huggingface_hub is not installed. For offline development use\n"
            "  python scripts/preprocess_dataset.py --processed-dir cache/ --synthetic 16",
            file=sys.stderr,
        )
        return 1

    api = HfApi()
    files = api.list_repo_files(REPO_ID, repo_type="dataset")
    downloaded = 0
    for f in sorted(files):
        cat = f.split("/")[0]
        if cat not in args.categories or not f.endswith(".zip"):
            continue
        dest = os.path.join(args.output_dir, f)
        if os.path.exists(dest):
            continue
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        hf_hub_download(
            REPO_ID, f, repo_type="dataset", local_dir=args.output_dir
        )
        downloaded += 1
        if args.max_cases and downloaded >= args.max_cases:
            break
    print(f"downloaded {downloaded} archives into {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
