"""CT slice-interpolation datasets (host-side numpy).

Rebuild of the reference data layer (data/slice_interpolation_dataset.py,
data/patch_slice_interpolation_dataset.py):

  * one-time preprocessing of DICOM cases (ZIPs or directories) into an
    ``.npz`` cache of windowed [-1, 1] float16 thick/thin volume pairs,
  * deterministic patient-level train/val/test splits via seeded shuffle,
  * a full-volume dataset with variable-depth padding + masks, and
  * a patch dataset producing fixed-size aligned (8, 192, 192) thick /
    (48, 192, 192) thin pairs with paired flip/rot90 augments.

Everything returns channels-last numpy ((D, H, W, 1) per sample) so batches
device_put straight into NDHWC model inputs. A synthetic-phantom cache
builder stands in for the 50 GB APE download (data/synthetic.py).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
import zipfile
from collections import OrderedDict
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from video_to_video_diffusion_tpu.config import Config, DataConfig, load_config
from video_to_video_diffusion_tpu.data.synthetic import synthetic_patient_pair
from video_to_video_diffusion_tpu.data.windowing import (
    apply_ct_windowing,
    linear_resample_depth,
    resize_slices,
    to_model_range,
)

PAD_VALUE = -1.0  # air in [-1, 1] (reference slice_interpolation_dataset.py:727-743)


# -------------------------------------------------------------- preprocessing
def _find_series_dirs(root: str) -> Tuple[Optional[str], Optional[str]]:
    """Locate the '1' (thick) and '2' (thin) series dirs under a case root.

    Reference `_extract_patient_data` walks nested directories looking for
    these conventional names (slice_interpolation_dataset.py:411-487).
    """
    thick = thin = None
    for dirpath, dirnames, _ in os.walk(root):
        for d in dirnames:
            if d == "1" and thick is None:
                thick = os.path.join(dirpath, d)
            elif d == "2" and thin is None:
                thin = os.path.join(dirpath, d)
        if thick and thin:
            break
    return thick, thin


def preprocess_case(
    case_path: str,
    cache_path: str,
    window_center: float = 40.0,
    window_width: float = 400.0,
    target_size: Tuple[int, int] = (512, 512),
    extract_dir: Optional[str] = None,
) -> None:
    """DICOM case (zip or dir) -> cached npz of [-1,1] float16 volumes.

    Mirrors the reference one-time pipeline: extract -> load -> HU window ->
    resize -> cache (slice_interpolation_dataset.py:254-409). `extract_dir`
    (data.extract_dir) is the scratch root for ZIP extraction — point it at
    fast local disk when the dataset lives on network storage; default is
    the system temp dir. Always cleaned up afterwards, like the reference's
    extract-then-delete flow.
    """
    from video_to_video_diffusion_tpu.data.dicom import load_dicom_volume

    tmpdir = None
    root = case_path
    try:
        if case_path.endswith(".zip"):
            if extract_dir:
                os.makedirs(extract_dir, exist_ok=True)
            tmpdir = tempfile.mkdtemp(prefix="v2v_dicom_", dir=extract_dir or None)
            with zipfile.ZipFile(case_path) as zf:
                zf.extractall(tmpdir)
            root = tmpdir
        thick_dir, thin_dir = _find_series_dirs(root)
        if thick_dir is None or thin_dir is None:
            raise ValueError(f"{case_path}: missing '1'/'2' series dirs")
        thick_hu, thick_mm = load_dicom_volume(thick_dir)
        thin_hu, thin_mm = load_dicom_volume(thin_dir)

        def prep(vol_hu):
            vol = apply_ct_windowing(vol_hu, window_center, window_width)
            vol = resize_slices(vol, target_size)
            return to_model_range(vol).astype(np.float16)

        np.savez_compressed(
            cache_path,
            input=prep(thick_hu),
            target=prep(thin_hu),
            window_center=np.float32(window_center),
            window_width=np.float32(window_width),
            meta=json.dumps(
                {"thick_mm": thick_mm, "thin_mm": thin_mm, "source": os.path.basename(case_path)}
            ),
        )
    finally:
        if tmpdir:
            shutil.rmtree(tmpdir, ignore_errors=True)


def preprocess_all_patients(cfg: DataConfig, logger=None) -> List[str]:
    """Preprocess every case under dataset_path into processed_dir.

    Failures are recorded in processed_dir/preprocessing_failures.txt
    (reference :386-398) and skipped.
    """
    assert cfg.dataset_path and cfg.processed_dir
    os.makedirs(cfg.processed_dir, exist_ok=True)
    cases = []
    for cat in cfg.categories:
        cat_dir = os.path.join(cfg.dataset_path, cat)
        if not os.path.isdir(cat_dir):
            continue
        for name in sorted(os.listdir(cat_dir)):
            p = os.path.join(cat_dir, name)
            if name.endswith(".zip") or os.path.isdir(p):
                cases.append((cat, p))
    done = []
    failures = []
    for cat, p in cases:
        case_id = os.path.splitext(os.path.basename(p))[0]
        out = os.path.join(cfg.processed_dir, f"{cat}__{case_id}.npz")
        if os.path.exists(out):
            done.append(out)
            continue
        try:
            preprocess_case(
                p, out, cfg.window_center, cfg.window_width, cfg.target_size,
                extract_dir=cfg.extract_dir,
            )
            done.append(out)
        except Exception as e:  # noqa: BLE001 — per-case fault isolation
            failures.append(f"{p}: {type(e).__name__}: {e}")
            if logger:
                logger.warning("preprocess failed for %s: %s", p, e)
    if failures:
        with open(os.path.join(cfg.processed_dir, "preprocessing_failures.txt"), "a") as f:
            f.write("\n".join(failures) + "\n")
    return done


def ensure_synthetic_cache(
    processed_dir: str,
    num_patients: int,
    thin_depth: int = 60,
    height: int = 96,
    width: int = 96,
    seed: int = 0,
) -> List[str]:
    """Build a synthetic-phantom cache in the same npz format.

    The cache is self-describing: a ``_synthetic_manifest.json`` records the
    geometry/seed it was built at, and any later request with a different
    geometry is a hard error instead of silently reusing stale volumes.
    (Round-4 postmortem, docs/RESULTS.md: a 192^2 config trained for a full
    round on a cached 96^2 dataset because existing files were skipped on
    patient id alone.) Legacy caches without a manifest are validated against
    the first volume's stored shape.
    """
    os.makedirs(processed_dir, exist_ok=True)
    want = {
        "thin_depth": int(thin_depth),
        "height": int(height),
        "width": int(width),
        "seed": int(seed),
    }
    manifest_path = os.path.join(processed_dir, "_synthetic_manifest.json")
    existing = [
        f for f in os.listdir(processed_dir)
        if f.startswith("SYN__") and f.endswith(".npz")
    ]
    if existing:
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                have = {k: int(v) for k, v in json.load(f).items() if k in want}
        else:
            with np.load(os.path.join(processed_dir, sorted(existing)[0])) as z:
                shp = z["target"].shape
            have = {**want, "thin_depth": shp[0], "height": shp[1], "width": shp[2]}
        if have != want:
            raise ValueError(
                f"synthetic cache {processed_dir!r} was built at {have}, but "
                f"this config asks for {want}. Point data.processed_dir at a "
                "fresh directory (or delete the stale cache) — silently "
                "training on mismatched geometry is the round-4 trap."
            )
    if not os.path.exists(manifest_path):
        with open(manifest_path, "w") as f:
            json.dump(want, f)
    paths = []
    for i in range(num_patients):
        out = os.path.join(processed_dir, f"SYN__{i:04d}.npz")
        paths.append(out)
        if os.path.exists(out):
            continue
        thick_hu, thin_hu = synthetic_patient_pair(
            seed + i, thin_depth=thin_depth, height=height, width=width
        )
        to16 = lambda v: apply_ct_windowing(v, pm1=True).astype(np.float16)
        np.savez_compressed(
            out,
            input=to16(thick_hu),
            target=to16(thin_hu),
            window_center=np.float32(40.0),
            window_width=np.float32(400.0),
            meta=json.dumps({"thick_mm": 5.0, "thin_mm": 1.0, "source": "synthetic"}),
        )
    return paths


# ----------------------------------------------------------------- splitting
def patient_split(
    files: Sequence[str], val_split: float, test_split: float, seed: int
) -> Dict[str, List[str]]:
    """Deterministic patient-level split by seeded shuffle (reference :226-252)."""
    files = sorted(files)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(files))
    shuffled = [files[i] for i in order]
    n = len(files)
    n_test = int(round(n * test_split))
    n_val = int(round(n * val_split))
    return {
        "test": shuffled[:n_test],
        "val": shuffled[n_test : n_test + n_val],
        "train": shuffled[n_test + n_val :],
    }


# ------------------------------------------------------------------ datasets
def _add_channel(v: np.ndarray) -> np.ndarray:
    # view, not copy: full volumes stay float16 until a patch/collate step
    # materializes the (much smaller) working set in f32
    return v[..., None]


class SliceInterpolationDataset:
    """Full-volume dataset over the npz cache (reference :51-771)."""

    def __init__(self, config, split: str = "train"):
        cfg: Config = load_config(config)
        self.cfg = cfg.data
        if self.cfg.synthetic_num_patients and self.cfg.processed_dir:
            files = ensure_synthetic_cache(
                self.cfg.processed_dir, self.cfg.synthetic_num_patients,
                thin_depth=self.cfg.synthetic_thin_depth,
                height=self.cfg.synthetic_height,
                width=self.cfg.synthetic_width,
                seed=self.cfg.seed,
            )
        else:
            assert self.cfg.processed_dir, "data.processed_dir required"
            files = [
                os.path.join(self.cfg.processed_dir, f)
                for f in os.listdir(self.cfg.processed_dir)
                if f.endswith(".npz")
            ]
            if not files and self.cfg.dataset_path:
                files = preprocess_all_patients(self.cfg)
        splits = patient_split(files, self.cfg.val_split, self.cfg.test_split, self.cfg.seed)
        self.files = splits[split]
        self.split = split
        # LRU over decompressed float16 volumes: npz decode dominates host
        # time when drawing many random patches per volume per epoch.
        self._cache: "OrderedDict[int, Tuple[np.ndarray, np.ndarray]]" = OrderedDict()
        self._cache_bytes = 0
        self._cache_limit = max(int(self.cfg.cache_size_bytes), 0)
        # loader.num_workers > 0 calls __getitem__ from a thread pool; an
        # unlocked OrderedDict races between the eviction popitem and a
        # concurrent hit's move_to_end — the resulting KeyError would be
        # swallowed by the retry chain below and silently substitute the
        # NEXT patient's volume. Lock all cache mutations (np.load itself
        # runs outside the lock so decompression still parallelizes).
        self._cache_lock = threading.Lock()

    def __len__(self) -> int:
        return len(self.files)

    def _load_raw(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        with self._cache_lock:
            if idx in self._cache:
                self._cache.move_to_end(idx)
                return self._cache[idx]
        with np.load(self.files[idx]) as z:
            pair = (z["input"], z["target"])  # float16 (D, H, W)
        nbytes = pair[0].nbytes + pair[1].nbytes
        if self._cache_limit and nbytes <= self._cache_limit:
            with self._cache_lock:
                while self._cache_bytes + nbytes > self._cache_limit and self._cache:
                    _, old = self._cache.popitem(last=False)
                    self._cache_bytes -= old[0].nbytes + old[1].nbytes
                self._cache[idx] = pair
                self._cache_bytes += nbytes
        return pair

    def __getitem__(self, idx: int, _retries: int = 10) -> Dict[str, np.ndarray]:
        """Load a cached case; corrupted files fall through to the next
        sample with a retry cap, then a dummy sample — the reference's
        fault-isolation chain (slice_interpolation_dataset.py:626-680)."""
        try:
            raw_thick, raw_thin = self._load_raw(idx)
            thick = _add_channel(raw_thick)
            thin = _add_channel(raw_thin)
        except (OSError, ValueError, zipfile.BadZipFile, KeyError):
            if _retries > 0 and len(self.files) > 1:
                return self.__getitem__((idx + 1) % len(self.files), _retries - 1)
            thick = np.full((8, 64, 64, 1), PAD_VALUE, np.float32)
            thin = np.full((48, 64, 64, 1), PAD_VALUE, np.float32)
        pid = os.path.splitext(os.path.basename(self.files[idx]))[0]
        return {
            "input": thick,
            "target": thin,
            # aliases kept from the reference sample dict (:760-771)
            "thick": thick,
            "thin": thin,
            "x_lr": thick,
            "x_hr": thin,
            "patient_id": pid,
            "num_thick_slices": thick.shape[0],
            "num_thin_slices": thin.shape[0],
        }


def collate_variable_depth(samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
    """Pad variable-depth volumes with -1.0 (air) and emit depth masks.

    Reference collate (:688-771): masks are 1 for real slices, 0 for padding.
    Returns NDHWC arrays 'input' (B, Dmax_in, H, W, 1), 'target', and (B, D)
    masks 'thick_mask'/'thin_mask'.
    """
    def pad_stack(key):
        vols = [s[key] for s in samples]
        dmax = max(v.shape[0] for v in vols)
        out = np.full((len(vols), dmax, *vols[0].shape[1:]), PAD_VALUE, np.float32)
        mask = np.zeros((len(vols), dmax), np.float32)
        for i, v in enumerate(vols):
            out[i, : v.shape[0]] = v
            mask[i, : v.shape[0]] = 1.0
        return out, mask

    thick, thick_mask = pad_stack("input")
    thin, thin_mask = pad_stack("target")
    return {
        "input": thick,
        "target": thin,
        "thick_mask": thick_mask,
        "thin_mask": thin_mask,
        "patient_id": [s["patient_id"] for s in samples],
    }


class PatchSliceInterpolationDataset:
    """Fixed-size aligned patch pairs from cached volumes (reference
    data/patch_slice_interpolation_dataset.py:33-290)."""

    def __init__(self, config, split: str = "train"):
        cfg: Config = load_config(config)
        self.cfg = cfg.data
        self.base = SliceInterpolationDataset(cfg, split)
        self.split = split
        self.augment = self.cfg.augment and split == "train"
        n = len(self.base) * max(self.cfg.patches_per_volume, 1)
        if split == "train" and self.cfg.max_train_samples:
            n = min(n, self.cfg.max_train_samples)
        self._len = n

    def __len__(self) -> int:
        return self._len

    def extract_random_patch(
        self, thick: np.ndarray, thin: np.ndarray, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Aligned random patch (reference :118-195).

        thick/thin: (D, H, W, 1) in [-1, 1]. Returns
        ((pd_thick, ph, pw, 1), (pd_thin, ph, pw, 1)).
        """
        pd_thin = self.cfg.patch_depth_thin
        pd_thick = self.cfg.patch_depth_thick
        ph, pw = self.cfg.patch_size
        D_thin, H, W, _ = thin.shape
        D_thick = thick.shape[0]

        # shared random spatial crop (:143-144)
        h0 = int(rng.integers(0, max(1, H - ph + 1)))
        w0 = int(rng.integers(0, max(1, W - pw + 1)))

        # random thin depth window (:147-158)
        z_thin0 = int(rng.integers(0, max(1, D_thin - pd_thin + 1)))
        z_thin1 = min(z_thin0 + pd_thin, D_thin)

        # map thin window into the thick stack (:165-174)
        ratio = D_thick / D_thin
        z_thick0 = int(np.floor(z_thin0 * ratio))
        z_thick1 = max(z_thick0 + 1, int(np.ceil(z_thin1 * ratio)))
        z_thick1 = min(z_thick1, D_thick)

        thin_p = thin[z_thin0:z_thin1, h0 : h0 + ph, w0 : w0 + pw]
        thick_sub = thick[z_thick0:z_thick1, h0 : h0 + ph, w0 : w0 + pw]
        # resample thick sub-stack to exactly pd_thick slices (:182-187)
        thick_p = linear_resample_depth(thick_sub, pd_thick).astype(np.float32)

        # pad thin with air if the window ran off the end (:190-193)
        thin_p = thin_p.astype(np.float32)
        if thin_p.shape[0] < pd_thin:
            pad = np.full(
                (pd_thin - thin_p.shape[0], ph, pw, 1), PAD_VALUE, np.float32
            )
            thin_p = np.concatenate([thin_p, pad], axis=0)
        return thick_p.astype(np.float32), thin_p

    def augment_patch(
        self, thick: np.ndarray, thin: np.ndarray, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Identical paired flips + k*90 rotations (reference :197-232)."""
        if rng.random() < 0.5:  # horizontal flip (W axis)
            thick, thin = thick[:, :, ::-1], thin[:, :, ::-1]
        if rng.random() < 0.5:  # vertical flip (H axis)
            thick, thin = thick[:, ::-1], thin[:, ::-1]
        k = int(rng.integers(0, 4))
        if k:
            thick = np.rot90(thick, k, axes=(1, 2))
            thin = np.rot90(thin, k, axes=(1, 2))
        return np.ascontiguousarray(thick), np.ascontiguousarray(thin)

    def __getitem__(self, idx: int, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        sample = self.base[idx % len(self.base)]
        rng = np.random.default_rng(seed)
        thick, thin = self.extract_random_patch(sample["input"], sample["target"], rng)
        if self.augment:
            thick, thin = self.augment_patch(thick, thin, rng)
        return {
            "input": thick,
            "target": thin,
            "thick": thick,
            "thin": thin,
            "patient_id": sample["patient_id"],
        }
