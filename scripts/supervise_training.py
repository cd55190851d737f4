"""Crash-resilient training supervisor.

The reference handles failures operationally: K8s Jobs with
restartPolicy: Never plus shell auto-resume on resubmission
(kub_files/vae-training-job-a100.yaml:35-60). This supervisor is the local
equivalent with actual failure detection: it runs a training CLI as a
subprocess, and on a crash (TPU backend errors, OOM-kills, tunnel drops)
restarts it — the CLIs auto-resume from the newest checkpoint, so at most
one checkpoint interval of work is lost.

Usage:
  python scripts/supervise_training.py --module training.train_vae \
      --config runs/vae.yaml [--max-restarts 10] [--min-uptime 60]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--module", required=True,
                    help="training module, e.g. training.train_vae")
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--min-uptime", type=float, default=60.0,
                    help="crashes faster than this count double against the budget")
    ap.add_argument("extra", nargs=argparse.REMAINDER,
                    help="extra args forwarded to the training CLI after "
                    "'--' (e.g. -- --init-params artifacts/diff_res4_best). "
                    "Safe across restarts: the CLIs' auto-resume takes "
                    "precedence over --init-params once a checkpoint exists")
    args = ap.parse_args(argv)

    mod = args.module
    if not mod.startswith("video_to_video_diffusion_tpu."):
        mod = "video_to_video_diffusion_tpu." + mod
    extra = args.extra[1:] if args.extra[:1] == ["--"] else args.extra
    cmd = [sys.executable, "-m", mod, "--config", args.config, *extra]

    restarts = 0
    budget = args.max_restarts
    while True:
        t0 = time.time()
        print(f"[supervisor] launching (attempt {restarts + 1}): {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd)
        uptime = time.time() - t0
        if rc == 0:
            print(f"[supervisor] training completed after {restarts} restarts", flush=True)
            return 0
        cost = 2 if uptime < args.min_uptime else 1
        restarts += cost
        print(
            f"[supervisor] exited rc={rc} after {uptime:.0f}s "
            f"(restart budget {budget - restarts} left)",
            flush=True,
        )
        if restarts >= budget:
            print("[supervisor] restart budget exhausted", flush=True)
            return rc
        time.sleep(min(10 * restarts, 120))  # backoff


if __name__ == "__main__":
    raise SystemExit(main())
