"""Metric sink: TensorBoard when available, JSONL always.

The reference logs scalars exclusively to a torch SummaryWriter
(training/trainer.py:117, :263-264, :404-405, ...). Here the same add_scalar
surface writes TensorBoard events when `tensorboard` is importable and
mirrors everything to a `metrics.jsonl` file so headless runs keep a
machine-readable record.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "t": time.time()})
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
