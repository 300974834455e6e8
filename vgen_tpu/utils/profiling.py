"""Tracing / profiling utilities.

The reference has no profiler beyond inline pynvml memory probes
(SURVEY §5.1; reference inference_i2vgen_entrance.py:197-200). The TPU
build gets first-class observability:

  * ``trace(log_dir)`` — context manager around jax.profiler for
    TensorBoard-viewable device traces.
  * ``StepTimer`` — wall-clock per-step stats with warmup skip; logs
    it/s and optional items/sec (frames, tokens).
  * ``device_memory_stats`` — HBM usage (replaces pynvml).
  * ``log_compile_time`` — wraps a callable, reporting first-call
    (compile) vs steady-state latency.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Callable, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
        logger.info("profiler trace started -> %s", log_dir)
    except Exception as e:  # noqa: BLE001 (axon backend may not support)
        logger.warning("profiler trace unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
            logger.info("profiler trace written -> %s", log_dir)


def device_memory_stats(device=None) -> dict:
    """HBM stats in GiB (replaces pynvml, reference :197-200)."""
    dev = device or jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
        gib = 1024 ** 3
        return {"bytes_in_use_gib": stats.get("bytes_in_use", 0) / gib,
                "peak_bytes_gib": stats.get("peak_bytes_in_use", 0) / gib,
                "bytes_limit_gib": stats.get("bytes_limit", 0) / gib}
    except Exception:  # noqa: BLE001
        return {}


class StepTimer:
    """Rolling step timer: call .tick() per step; .summary() to log."""

    def __init__(self, warmup: int = 2, items_per_step: Optional[float] = None):
        self.warmup = warmup
        self.items = items_per_step
        self.times = []
        self._last = None
        self._count = 0

    def tick(self):
        now = time.time()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def summary(self) -> str:
        if not self.times:
            return "no steps timed"
        m = self.mean
        s = f"{m:.3f}s/it ({1.0 / m:.2f} it/s)"
        if self.items:
            s += f", {self.items / m:.1f} items/s"
        return s


def log_compile_time(fn: Callable, *args, label: str = "fn", n: int = 3):
    """Run fn once (compile) then n times (steady); log both."""
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    steady = (time.time() - t0) / n
    logger.info("%s: compile+first %.1fs, steady %.3fs", label, compile_s,
                steady)
    return out, compile_s, steady
