"""Profiling hooks (jax.profiler).

The reference has only wall-clock timers in tqdm postfixes
(training/trainer.py:199-275). The TPU-native replacement: jax.profiler
traces viewable in TensorBoard/Perfetto, plus named step/trace annotations.

Usage:
    with trace_context("logdir"):           # whole-section trace
        ...
    with step_annotation("train_step", i):  # names a step inside a trace
        ...
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a profiler trace into log_dir (no-op when log_dir is falsy)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str, step: Optional[int] = None):
    """Named annotation that shows up on the trace timeline."""
    if step is not None:
        return jax.profiler.StepTraceAnnotation(name, step_num=step)
    return jax.profiler.TraceAnnotation(name)
