"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference's only instrumentation is wall-clock epoch timing and CUDA memory
prints (src/main.py:117,243,654-657). The TPU-native replacement:

- ``trace(logdir)``: context manager around ``jax.profiler`` trace capture —
  produces TensorBoard-compatible traces of XLA ops, host callbacks and
  transfers.
- ``StepTimer``: cheap per-step wall-clock stats with warmup skipping (the
  honest way to time dispatch+device under async execution: call ``stop`` on a
  block_until_ready'd output).
- ``device_memory_stats``: live HBM usage per device where the backend exposes
  it (the cuda memory-print analog).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mde_tpu_trace", create_perfetto_link: bool = False):
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0: Optional[float] = None
        self._seen = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *block_on):
        for x in block_on:
            jax.block_until_ready(x)
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "min_s": float(arr.min()),
        }


def device_memory_stats() -> list[dict]:
    stats = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except (AttributeError, jax.errors.JaxRuntimeError, RuntimeError, TypeError):
            s = {}
        stats.append(
            {
                "device": str(d),
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        )
    return stats
