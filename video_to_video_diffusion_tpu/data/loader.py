"""Unified dataloader: batching, paired-RNG sampling, host->device prefetch.

Rebuild of the reference router (data/get_dataloader.py:40-162) plus the
DataLoader-worker machinery it inherits from torch. On TPU the input pipeline
is host-side numpy feeding device_put'd NDHWC batches; a background thread
keeps `prefetch` batches in flight so the accelerator never waits on the host
(the reference achieves this with pin_memory + worker prefetch,
patch_slice_interpolation_dataset.py:342-352).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from video_to_video_diffusion_tpu.config import Config, load_config
from video_to_video_diffusion_tpu.data.datasets import (
    PatchSliceInterpolationDataset,
    SliceInterpolationDataset,
    collate_variable_depth,
)


def _stack_patches(samples) -> Dict[str, np.ndarray]:
    return {
        "input": np.stack([s["input"] for s in samples]),
        "target": np.stack([s["target"] for s in samples]),
        "patient_id": [s["patient_id"] for s in samples],
    }


class DataLoader:
    """Epoch iterator over a map-style dataset with seeded shuffling.

    Patch sampling randomness is derived from (epoch, index) so runs are
    reproducible yet every epoch sees fresh patches.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        seed: int = 0,
        collate=None,
        prefetch: int = 2,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.collate = collate or _stack_patches
        self.prefetch = prefetch
        # N-thread parallel sample extraction (reference: DataLoader worker
        # processes, patch_slice_interpolation_dataset.py:342-352). Threads
        # rather than processes: extraction is numpy/zlib-bound which drops
        # the GIL, and threads share the dataset's in-memory volume cache.
        # 0 = extract inline on the producer thread.
        self.num_workers = max(int(num_workers), 0)
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self, epoch: int):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        return idx

    def _get_sample(self, epoch: int, i: int):
        if hasattr(self.dataset, "extract_random_patch"):
            # per-(epoch, item) deterministic patch seed — identical draws
            # regardless of worker count or completion order
            return self.dataset.__getitem__(
                int(i), seed=(self.seed + epoch) * 1_000_003 + int(i)
            )
        return self.dataset[int(i)]

    def _iter_batches(self, epoch: int):
        idx = self._indices(epoch)
        bs = self.batch_size
        end = (len(idx) // bs) * bs if self.drop_last else len(idx)
        pool = (
            ThreadPoolExecutor(max_workers=self.num_workers)
            if self.num_workers > 0
            else None
        )
        try:
            for start in range(0, end, bs):
                chunk = idx[start : start + bs]
                if not len(chunk):
                    continue
                if pool is not None:
                    samples = list(
                        pool.map(lambda i: self._get_sample(epoch, i), chunk)
                    )
                else:
                    samples = [self._get_sample(epoch, i) for i in chunk]
                yield self.collate(samples)
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = self.epoch
        self.epoch += 1  # each fresh iterator sees a new shuffle/patch draw
        if self.prefetch <= 0:
            yield from self._iter_batches(epoch)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in self._iter_batches(epoch):
                    if not _put(b):
                        return
            finally:
                _put(_SENTINEL)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                b = q.get()
                if b is _SENTINEL:
                    break
                yield b
        finally:
            # Abandoned iterators (early validation breaks, exceptions) must
            # release the producer, or each leak leaves a thread blocked on a
            # full queue forever.
            stop.set()
            th.join(timeout=5)


def get_dataloader(config, split: str = "train") -> DataLoader:
    """Dataloader factory (reference data/get_dataloader.py:40-162).

    Routes on `data.use_patches`: the patch dataset for training, the
    full-volume dataset (variable-depth collate) otherwise. Only
    data_source='slice_interpolation' is supported, like the reference
    (:94-99).
    """
    cfg: Config = load_config(config)
    d = cfg.data
    if d.data_source != "slice_interpolation":
        raise ValueError(
            f"Unsupported data_source {d.data_source!r}; only 'slice_interpolation'"
        )
    if d.use_patches:
        ds = PatchSliceInterpolationDataset(cfg, split)
        return DataLoader(
            ds,
            batch_size=d.batch_size,
            shuffle=(split == "train"),
            drop_last=d.drop_last and split == "train",
            seed=d.seed,
            collate=_stack_patches,
            num_workers=d.num_workers,
        )
    ds = SliceInterpolationDataset(cfg, split)
    return DataLoader(
        ds,
        batch_size=d.batch_size,
        shuffle=(split == "train"),
        drop_last=d.drop_last and split == "train",
        seed=d.seed,
        collate=collate_variable_depth,
        num_workers=d.num_workers,
    )


# exported alias matching the reference (data/__init__.py:3)
get_unified_dataloader = get_dataloader


def create_training_config(
    processed_dir: str,
    batch_size: int = 8,
    patch_size=(192, 192),
    patch_depth_thick: int = 8,
    patch_depth_thin: int = 48,
    **overrides,
) -> Config:
    """Convenience config factory (reference data/get_dataloader.py:164)."""
    raw = {
        "data": {
            "processed_dir": processed_dir,
            "use_patches": True,
            "batch_size": batch_size,
            "patch_size": list(patch_size),
            "patch_depth_thick": patch_depth_thick,
            "patch_depth_thin": patch_depth_thin,
            **overrides,
        }
    }
    return load_config(raw)
