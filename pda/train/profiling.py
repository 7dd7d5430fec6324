"""Profiling + throughput counters (SURVEY.md section 5.1).

The reference's only tracing is wall-clock per-iteration timing
(punet_trainer.py:23,49-50). Here:

  * :class:`Throughput` — patches/sec + steps/sec counters the engine
    maintains every fit (the BASELINE patches/sec/chip metric);
  * :func:`trace` — context manager around ``jax.profiler`` for device
    traces viewable in TensorBoard / Perfetto (works on TPU and CPU).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class Throughput:
    """Accumulates step + sample counts over a training run."""

    steps: int = 0
    samples: int = 0
    _t0: float = field(default_factory=time.perf_counter)
    elapsed: float = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        self.elapsed += time.perf_counter() - self._t0

    def update(self, batch_size: int):
        self.steps += 1
        self.samples += batch_size

    @property
    def steps_per_sec(self) -> float:
        return self.steps / max(self.elapsed, 1e-9)

    @property
    def samples_per_sec(self) -> float:
        return self.samples / max(self.elapsed, 1e-9)

    def summary(self) -> dict:
        return {
            "steps": self.steps,
            "samples": self.samples,
            "elapsed_sec": self.elapsed,
            "steps_per_sec": self.steps_per_sec,
            "patches_per_sec": self.samples_per_sec,
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/profile"):`` — captures a jax.profiler device trace."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
