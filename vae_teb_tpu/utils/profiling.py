"""Profiling + device observability.

TPU-native replacement for the reference's instrumentation
(/root/reference/model/graph_model.py:99-193,465,507 — Lightning
SimpleProfiler, GPU-memory helpers, OOM batch-size probe):

  trace(...)            jax.profiler Perfetto trace of a code region
  StepTimer             per-section wall times -> SimpleProfiler-style report
  device_memory_stats   live HBM usage per device
  find_max_batch_size   largest power-of-two batch that fits (OOM probe)
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_trace: bool = False):
    """Capture a jax.profiler trace for the enclosed region (view in
    TensorBoard or Perfetto). The reference's SimpleProfiler analogue with
    real device timelines instead of host wall-clock."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_trace=create_perfetto_trace)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulate wall-times per named section and emit a report file
    (the reference writes profiler_base_model.txt into the run dir)."""

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def report(self) -> str:
        lines = [f"{'section':30s} {'calls':>8s} {'total_s':>10s} {'mean_ms':>10s}"]
        for name in sorted(self._totals, key=self._totals.get, reverse=True):
            tot, cnt = self._totals[name], self._counts[name]
            lines.append(f"{name:30s} {cnt:8d} {tot:10.3f} "
                         f"{1000 * tot / max(cnt, 1):10.2f}")
        return "\n".join(lines)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.report() + "\n")


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory statistics in MB (where the backend reports them)."""
    out = {}
    for dev in jax.devices():
        stats = {}
        try:
            raw = dev.memory_stats() or {}
            for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
                if key in raw:
                    stats[key.replace("bytes", "mb")] = raw[key] / 1024 ** 2
        except Exception:
            pass
        out[str(dev)] = stats
    return out


def find_max_batch_size(step_fn: Callable[[int], None],
                        start: int = 1, limit: int = 4096) -> int:
    """Double the batch size until step_fn raises an out-of-memory error;
    return the largest size that succeeded (the reference's
    find_optimal_batch_size OOM probe, graph_model.py:128-193)."""
    best = 0
    b = start
    while b <= limit:
        try:
            step_fn(b)
            best = b
            b *= 2
        except Exception as e:  # XLA OOM surfaces as RuntimeError
            if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                break
            raise
    return best
