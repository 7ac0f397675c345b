"""Profiling/observability: step timing, throughput counters, tracing.

The reference has no profiling beyond tqdm postfixes (SURVEY.md §5).
Rebuild: per-step wall timing with rays/sec + steps/sec counters (the
BASELINE metrics) and a `jax.profiler` trace context for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Accumulates step wall time and ray counts (EMA + totals).

    Two ways to feed it:

    - ``with timer.step(rays=…):`` around a BLOCKING call.  Do NOT wrap an
      async-dispatched jitted step: the context would time the enqueue, not
      the compute, and report wildly inflated rates.
    - ``timer.observe(steps, rays, seconds)`` with a wall-clock span taken
      over an explicit ``jax.block_until_ready`` barrier (how the training
      loop reports per-epoch throughput without serializing dispatch).
    """

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_dt: Optional[float] = None
        self.total_steps = 0
        self.total_rays = 0
        self.total_time = 0.0
        self._last_rays = 0

    @contextlib.contextmanager
    def step(self, rays: int = 0):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.total_steps += 1
        self.total_rays += rays
        self.total_time += dt
        self._last_rays = rays
        self.avg_dt = dt if self.avg_dt is None else (
            self.ema * self.avg_dt + (1 - self.ema) * dt
        )

    def observe(self, steps: int, rays: int, seconds: float):
        """Record a barrier-bounded span covering ``steps`` steps."""
        if steps <= 0 or seconds <= 0:
            return
        self.total_steps += steps
        self.total_rays += rays
        self.total_time += seconds
        dt = seconds / steps
        self._last_rays = rays // steps
        self.avg_dt = dt if self.avg_dt is None else (
            self.ema * self.avg_dt + (1 - self.ema) * dt
        )

    def steps_per_sec(self) -> float:
        return 1.0 / self.avg_dt if self.avg_dt else 0.0

    def rays_per_sec(self) -> float:
        if not self.avg_dt or not self._last_rays:
            return 0.0
        return self._last_rays / self.avg_dt


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def live_array_bytes() -> int:
    """Total bytes of live, undeleted ``jax.Array`` buffers — the
    client-referenced device residency.  Works on backends where
    ``memory_stats()`` is None (the axon tunnel), where it is the only
    runtime HBM measurement available; it localized the round-4
    resume-path OOM (training/loop.py log_hbm)."""
    return sum(a.nbytes for a in jax.live_arrays() if not a.is_deleted())


def measured_hbm_gb():
    """(kind, GiB): the best available runtime HBM number (VERDICT r4
    weak #2 — bench rows carried a dead ``peak_hbm_gb: 0.0``).

    * ``("allocator_peak", …)`` where the backend reports
      ``peak_bytes_in_use`` — a true high-water mark including step
      temporaries;
    * ``("live_arrays", …)`` otherwise — current client-referenced
      residency only; step temporaries are invisible to it, so pair it
      with the compile-time ``memory_analysis`` temp/argument stats for
      the full picture.
    """
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    if peak:
        return "allocator_peak", peak / 2 ** 30
    return "live_arrays", live_array_bytes() / 2 ** 30


def device_memory_stats() -> dict:
    """Per-device memory stats (the reference's get_memory_usage equivalent,
    utils/system_utils.py:4-7)."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
