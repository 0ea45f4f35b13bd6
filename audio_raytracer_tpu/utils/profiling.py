"""Profiling & metrics.

The reference instruments with editor-only Stopwatches + an FPS HUD
(Audio/AudioRayTracer.cs:58-59, _Editor/DebugDataDisplay.cs). TPU-side
the equivalents are jax.profiler traces plus step timing that survives
the async-dispatch relay (a host transfer is the only true sync)."""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def sync(tree) -> float:
    """Force completion of ``tree`` via a host transfer of one leaf and
    return that leaf's first element. block_until_ready alone can return
    before compute completes on relayed device platforms."""
    leaf = jax.tree.leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


@contextlib.contextmanager
def step_timer(results: dict, key: str):
    """Wall-time a step into results[key] (call sync() inside the block)."""
    t0 = time.perf_counter()
    yield
    results[key] = results.get(key, 0.0) + (time.perf_counter() - t0)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Rolling rays/s meter (the DebugDataDisplay FPS average analog)."""

    def __init__(self, window: int = 20):
        self.window = window
        self._samples: list[tuple[float, float]] = []

    def record(self, rays: int, seconds: float):
        self._samples.append((rays, seconds))
        if len(self._samples) > self.window:
            self._samples.pop(0)

    @property
    def rays_per_s(self) -> float:
        if not self._samples:
            return 0.0
        rays = sum(r for r, _ in self._samples)
        secs = sum(s for _, s in self._samples)
        return rays / secs if secs else 0.0
