"""Tracing, profiling and memory observability.

The reference's telemetry is ad-hoc (commented std::chrono timers, a tensor
memory printer at gaussian_mapper.cpp:147-159, CPU/GPU memory queries in
submodules/utils/utils.h:29-31). The TPU-native equivalents are systematic:
`jax.profiler` traces around the train step, device memory stats from the
runtime, and a tiny phase timer for the host loop.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


def tensor_memory_mb(tree) -> float:
    """printTensorMemory equivalent for any pytree of arrays."""
    leaves = jax.tree.leaves(tree)
    return sum(np.asarray(v).nbytes for v in leaves if hasattr(v, "nbytes")) / 2**20


def device_memory_stats() -> dict:
    """HBM usage from the runtime (utils::get_gpu_memory analog)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Host-side phase timer for the mapper loop (EMA per phase)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.means: dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            old = self.means[name]
            self.means[name] = dt if old == 0 else self.ema * old + (1 - self.ema) * dt

    def report(self) -> str:
        return " ".join(f"{k}={v * 1000:.1f}ms" for k, v in sorted(self.means.items()))
