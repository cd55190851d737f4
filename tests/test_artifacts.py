"""Git-tracked trained-weight snapshots (artifacts/) stay loadable.

Round 3 lost its trained models to a VM reset because checkpoints lived
only in runs/ (VERDICT r3 missing #2). scripts/snapshot_artifacts.py now
copies every best checkpoint into the committed artifacts/ tree; these
tests pin that the snapshots restore and carry the metadata the eval
tooling needs (best_psnr, config, and — for diffusion — which weight side
won best-checkpoint selection).
"""

import os

import jax
import pytest

from video_to_video_diffusion_tpu.utils.checkpoint import load_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = os.path.join(REPO, "artifacts")


def _snapshots():
    if not os.path.isdir(ARTIFACTS):
        return []
    return sorted(
        os.path.join(ARTIFACTS, d)
        for d in os.listdir(ARTIFACTS)
        if os.path.isdir(os.path.join(ARTIFACTS, d))
    )


@pytest.mark.parametrize(
    "path", _snapshots() or [pytest.param(None, marks=pytest.mark.skip("no artifacts/ snapshots"))]
)
def test_artifact_snapshot_restores(path):
    restored, meta = load_checkpoint(path)
    params = restored.get("params", restored)
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    assert n > 0
    assert "config" in meta and "model" in meta["config"]
    # a best snapshot must carry the metric it was selected on
    assert any(k in meta for k in ("best_psnr", "best_loss", "best_val_loss"))
    # diffusion snapshots with EMA must not have dropped the averaged side
    # (ADVICE r3: a params-only snapshot could preserve the losing weights)
    if meta.get("has_ema") or meta.get("best_weights") == "ema":
        assert restored.get("ema_params") is not None
