"""Profiling: XLA trace capture + step-time instrumentation.

TPU equivalent of the reference's dormant FlopsProfiler / torch.profiler
imports and its active wall-clock meters (SURVEY.md section 5.1,
traintest_cavmae_base.py:118-120,164-183): ``trace`` wraps a region in
``jax.profiler`` (view in TensorBoard/XProf), ``StepTimer`` reproduces the
per-sample total/data/DNN split.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

from avsiam_tpu.eval.metrics import AverageMeter


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profile for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """per_sample_time / per_sample_data_time / per_sample_dnn_time meters
    (traintest_cavmae_base.py:38,118-120)."""

    def __init__(self):
        self.per_sample_time = AverageMeter()
        self.per_sample_data_time = AverageMeter()
        self.per_sample_dnn_time = AverageMeter()
        self._end = time.time()
        self._dnn_start = None

    def data_ready(self, batch_size: int):
        now = time.time()
        self.per_sample_data_time.update((now - self._end) / batch_size)
        self._dnn_start = now

    def step_done(self, batch_size: int):
        now = time.time()
        self.per_sample_time.update((now - self._end) / batch_size)
        if self._dnn_start is not None:
            self.per_sample_dnn_time.update(
                (now - self._dnn_start) / batch_size)
        self._end = now

    def summary(self) -> Dict[str, float]:
        return {
            "per_sample_time": self.per_sample_time.avg,
            "per_sample_data_time": self.per_sample_data_time.avg,
            "per_sample_dnn_time": self.per_sample_dnn_time.avg,
        }


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """Peak/current HBM use when the backend exposes memory_stats."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {k: v for k, v in stats.items()
            if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
