"""Timing + tracing harness.

Replaces the reference's scattered ``std::chrono`` prints (SURVEY.md
section 5.1) with: (a) a block_until_ready-correct stage timer, (b) a
pipelined device-throughput measurer (per-call sync through a tunnel/PCIe
measures RTT, not device time), and (c) xprof-compatible trace capture via
``jax.profiler`` for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


class StageTimer:
    """Accumulates wall-clock spans per named stage, with device sync."""

    def __init__(self):
        self.spans: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.spans.setdefault(name, []).append(
                (time.perf_counter() - t0) * 1000.0
            )

    def summary(self) -> dict[str, dict]:
        out = {}
        for name, xs in self.spans.items():
            a = np.asarray(xs)
            out[name] = {
                "n": len(xs),
                "mean_ms": float(a.mean()),
                "p50_ms": float(np.median(a)),
                "p95_ms": float(np.percentile(a, 95)),
            }
        return out


def device_time_ms(
    fn: Callable, *args, inner: int = 30, trials: int = 5
) -> float:
    """Median per-call DEVICE time of a jitted function, by pipelining
    ``inner`` dispatches per trial (amortises host/tunnel latency)."""
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / inner * 1000.0)
    return float(np.median(times))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/icet_tpu_trace"):
    """Capture an xprof trace of the enclosed block (view with tensorboard
    or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
