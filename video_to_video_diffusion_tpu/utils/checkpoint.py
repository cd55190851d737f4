"""Checkpoint save/restore + discovery helpers (Orbax-backed).

Rebuild of the reference checkpoint layer (utils/checkpoint.py:17-245 and
models/model.py:345-388): checkpoints carry {params, opt_state-ish pytrees}
plus metadata {epoch, global_step, current_phase, best_loss, config}. Torch
`.pt` files become Orbax checkpoint *directories*; the reference's filename
conventions and suffix system are preserved so discovery globs behave the
same (`checkpoint_best_epoch_0007_suffix/`, `vae_best_suffix/`, ...). bf16
needs no GradScaler on TPU, so no scaler state exists (the reference stores
one, model.py:371-374).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_META_NAME = "v2v_metadata.json"


def _to_abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(path: str, state: Any, metadata: Optional[Dict] = None) -> None:
    """Save a pytree + JSON metadata to an Orbax checkpoint directory."""
    path = _to_abs(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))
    if metadata is not None:
        with open(os.path.join(path, _META_NAME), "w") as f:
            json.dump(metadata, f, default=str)


def load_checkpoint(path: str, target: Any = None) -> Tuple[Any, Dict]:
    """Restore (pytree, metadata). `target` gives structure/dtype/sharding."""
    path = _to_abs(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            restored = ckptr.restore(path, item=target)
        else:
            restored = ckptr.restore(path)
    meta_path = os.path.join(path, _META_NAME)
    metadata: Dict = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return restored, metadata


def _is_checkpoint_dir(p: str) -> bool:
    return os.path.isdir(p) and (
        os.path.exists(os.path.join(p, _META_NAME))
        or os.path.exists(os.path.join(p, "_CHECKPOINT_METADATA"))
    )


def list_all_checkpoints(checkpoint_dir: str, suffix: str = "") -> List[str]:
    """All checkpoint dirs matching the optional model suffix (reference :214)."""
    checkpoint_dir = _to_abs(checkpoint_dir)
    if not os.path.isdir(checkpoint_dir):
        return []
    out = []
    for name in sorted(os.listdir(checkpoint_dir)):
        p = os.path.join(checkpoint_dir, name)
        if not _is_checkpoint_dir(p):
            continue
        if suffix and not name.endswith(suffix):
            continue
        out.append(p)
    return out


def find_best_checkpoint(checkpoint_dir: str, suffix: str = "") -> Optional[str]:
    """Newest `checkpoint_best_epoch_*` dir (reference utils/checkpoint.py:17-52)."""
    pat = re.compile(r"checkpoint_best_epoch_(\d+)")
    candidates = []
    for p in list_all_checkpoints(checkpoint_dir, suffix):
        m = pat.search(os.path.basename(p))
        if m:
            candidates.append((int(m.group(1)), os.path.getmtime(p), p))
    if not candidates:
        return None
    return max(candidates)[2]


def find_latest_checkpoint(checkpoint_dir: str, suffix: str = "") -> Optional[str]:
    """Most recently written checkpoint dir (reference :54-84)."""
    candidates = [
        (os.path.getmtime(p), p) for p in list_all_checkpoints(checkpoint_dir, suffix)
    ]
    return max(candidates)[1] if candidates else None


def load_model_from_checkpoint(path: str, target: Any = None) -> Tuple[Any, Dict]:
    """Format-sniffing param loader (reference utils/checkpoint.py:126-180).

    Accepts a VAE-trainer checkpoint ({'params': <vae tree>}), a full
    diffusion checkpoint ({'params': {'vae', 'unet'}}) or a bare param tree;
    returns (params, metadata).
    """
    restored, meta = load_checkpoint(path, target=target)
    params = restored.get("params", restored) if isinstance(restored, dict) else restored
    return params, meta


def extract_model_suffix_from_path(path: str) -> str:
    """Recover the model_suffix embedded in a checkpoint name (reference :182-211)."""
    name = os.path.basename(os.path.normpath(path))
    m = re.match(r"(?:checkpoint_(?:best|final)_epoch_\d+|vae_(?:best|epoch_\d+))(?:_(.+))?$", name)
    return (m.group(1) or "") if m else ""
