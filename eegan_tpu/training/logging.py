"""Observability: scalar metric writer + step timing.

The reference logs scalars through tensorboardX every UPDATE_INTERVAL=100
iterations (reference `train.py:34,462-498`) and has no profiling beyond
tqdm (SURVEY.md §5). Here:

* scalars go to TensorBoard event files (via torch.utils.tensorboard when
  available) AND an append-only ``metrics.jsonl`` (always, dependency-free);
* a `StepTimer` tracks wall-clock images/sec with warmup skipping;
* `trace()` wraps a block in a `jax.profiler` trace for TPU profiling.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
from typing import Dict, Optional

import jax


class MetricWriter:
    """Thread-safe: the trainer and the async evaluator both write."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._lock = threading.Lock()
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        clean = {k: float(v) for k, v in scalars.items()}
        record = {"step": int(step), "time": time.time(), **clean}
        with self._lock:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
            if self._tb is not None:
                for k, v in clean.items():
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Images/sec tracker with warmup skip."""

    def __init__(self, batch_size: int, warmup: int = 2):
        self.batch_size = batch_size
        self.warmup = warmup
        self._count = 0
        self._t0 = None
        self._steps = 0

    def tick(self):
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()
            self._steps = 0
        elif self._count > self.warmup:
            self._steps += 1

    @property
    def images_per_sec(self) -> Optional[float]:
        if self._t0 is None or self._steps == 0:
            return None
        return self._steps * self.batch_size / (time.perf_counter() - self._t0)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
