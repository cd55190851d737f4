"""Snapshot a training checkpoint's params into the git-tracked artifacts/.

The training output tree (runs/) is gitignored and the build VMs are
ephemeral — a VM reset between sessions destroys every checkpoint (it cost
round 3 its first trained VAE + diffusion run). This tool copies the
*params only* (no optimizer state, ~1/3 the bytes) of an Orbax checkpoint
into artifacts/<name> as a normal Orbax checkpoint dir so it can be
committed and later used directly by every consumer that takes a checkpoint
path (pretrained.vae.checkpoint_path, eval --checkpoint, generate_volume
--checkpoint), or as a warm start after a reset.

Usage:
  python scripts/snapshot_artifacts.py --checkpoint runs/vae_res3/checkpoints/vae_res3/vae_best_vae_res3 \
      --out artifacts/vae_res3_best [--commit]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="source Orbax checkpoint dir")
    ap.add_argument("--out", required=True, help="destination dir under artifacts/")
    ap.add_argument("--commit", action="store_true",
                    help="git add + commit the snapshot")
    ap.add_argument("--full", action="store_true",
                    help="keep optimizer state too (cross-VM training resume)")
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from video_to_video_diffusion_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    restored, meta = load_checkpoint(args.checkpoint)
    params = restored.get("params", restored)
    meta = dict(meta)
    meta["snapshot_of"] = os.path.abspath(args.checkpoint)
    if args.full:
        state = restored
    else:
        # Keep the EMA average alongside the live params: diffusion
        # checkpoints store both, metadata 'best_weights' may record that
        # the EMA side won best-checkpoint selection, and a params-only
        # snapshot would silently preserve the losing weights.
        state = {"params": params}
        if isinstance(restored, dict) and restored.get("ema_params") is not None:
            state["ema_params"] = restored["ema_params"]
    save_checkpoint(args.out, state, meta)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(json.dumps({"out": args.out, "params": int(n),
                      "epoch": meta.get("epoch"), "best_psnr": meta.get("best_psnr")}))
    if args.commit:
        subprocess.run(["git", "add", args.out], check=True)
        msg = (f"Snapshot {os.path.basename(args.out)} "
               f"(epoch {meta.get('epoch')}, best_psnr {meta.get('best_psnr')})"
               "\n\nNo-Verification-Needed: binary checkpoint snapshot, no source change")
        subprocess.run(["git", "commit", "-q", "-m", msg,
                        "--", args.out], check=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
