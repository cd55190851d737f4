"""Summarize a jax.profiler trace directory: top device ops by self time.

The jax profiler writes <dir>/plugins/profile/<ts>/*.trace.json.gz (a
Chrome/Perfetto trace). This script aggregates device-lane events by name
prefix and prints the top-N with total time and share — enough to answer
"where does the sample stage's time go" without TensorBoard (the build host
has no browser; VERDICT r4 next #5).

Usage:
  python scripts/summarize_trace.py <trace_dir> [--top 30] [--lane tpu]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def find_trace_files(root: str):
    pats = [
        os.path.join(root, "**", "*.trace.json.gz"),
        os.path.join(root, "**", "*.trace.json"),
    ]
    out = []
    for p in pats:
        out += glob.glob(p, recursive=True)
    return sorted(out)


def load_events(path: str):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


_GENERIC = re.compile(r"\d+")


def canon(name: str) -> str:
    """Collapse op instances: 'fusion.123' -> 'fusion', keep hlo op class."""
    name = name.split("/")[-1]
    name = _GENERIC.sub("", name)
    return name.rstrip("._-") or name


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument(
        "--lane",
        default="",
        help="only count events from process/thread names matching this "
        "substring (e.g. 'TPU', 'XLA'); default: all complete ('X') events",
    )
    ap.add_argument("--raw", action="store_true",
                    help="do not collapse op-instance numbers")
    args = ap.parse_args(argv)

    files = find_trace_files(args.trace_dir)
    if not files:
        print(f"no trace files under {args.trace_dir}", file=sys.stderr)
        return 1

    # pid/tid -> lane name, from metadata events
    lanes = {}
    totals = defaultdict(float)
    counts = defaultdict(int)
    wall = 0.0
    for path in files:
        evs = load_events(path)
        for e in evs:
            if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
                lanes[(e.get("pid"), e.get("tid") if e["name"] == "thread_name" else None)] = (
                    e.get("args", {}).get("name", "")
                )
        for e in evs:
            if e.get("ph") != "X":
                continue
            lane = (
                lanes.get((e.get("pid"), e.get("tid")))
                or lanes.get((e.get("pid"), None))
                or ""
            )
            if args.lane and args.lane.lower() not in lane.lower():
                continue
            dur = float(e.get("dur", 0.0))  # microseconds
            name = e.get("name", "?") if args.raw else canon(e.get("name", "?"))
            totals[name] += dur
            counts[name] += 1
            wall += dur

    rows = sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]
    print(f"# {len(files)} trace file(s), {sum(counts.values())} events, "
          f"{wall/1e6:.3f} s total event time (lane filter: {args.lane or 'none'})")
    print(f"{'op':48s} {'total_ms':>10s} {'count':>7s} {'share':>7s}")
    for name, us in rows:
        print(f"{name[:48]:48s} {us/1e3:10.1f} {counts[name]:7d} {us/wall*100:6.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
