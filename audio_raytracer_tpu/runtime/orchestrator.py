"""Async per-frame orchestration: dispatch tracing, harvest when done.

The reference's frame driver (Audio/AudioRayTracer.cs:92-238) schedules
its job graph and harvests it a frame (or more) later, skipping frames
while jobs run (``computeAsync``, AudioRaytracingManager.cs:13). Here the
analog is XLA async dispatch: ``tick()`` snapshots the registry (the
double-buffer publish), dispatches the jitted step without blocking, and
returns the most recent *completed* frame's settings. The fork-join
raytrace || permeation -> reduce graph lives inside one jitted function,
scheduled by XLA.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from audio_raytracer_tpu.models.raytracer import forward
from audio_raytracer_tpu.ops.fibonacci import fibonacci_directions
from audio_raytracer_tpu.types import TargetSettings, TraceConfig


class AsyncRaytraceLoop:
    """Owns ray buffers + the jitted step; one instance per listener.

    Usage per frame: ``settings = loop.tick(origin)``; returns None until
    the first frame completes (async mode), then always the latest
    completed TargetSettings (device arrays).
    """

    def __init__(self, registry, cfg: TraceConfig, backend: str = "jnp",
                 compute_async: bool = True):
        self.registry = registry
        self.cfg = cfg
        self.compute_async = compute_async
        self._directions = fibonacci_directions(cfg.ray_count)
        self._backend = backend

        def step(origin, directions, scene):
            _, settings = forward(origin, directions, scene, cfg,
                                  backend=backend)
            return settings

        self._step = jax.jit(step)
        self._in_flight = None
        self._latest = None

        # Instrumentation (the raytracerMs / batchCycleMs stopwatches,
        # AudioRayTracer.cs:58-59,100-104,158).
        self.raytracer_ms = 0.0
        self.batch_cycle_ms = 0.0
        self.frames_dispatched = 0
        self.frames_harvested = 0
        self._dispatch_time = None

    def _is_ready(self, settings) -> bool:
        try:
            return all(leaf.is_ready() for leaf in jax.tree.leaves(settings))
        except AttributeError:
            return True

    def tick(self, origin) -> TargetSettings | None:
        """One frame: harvest if complete, re-sync scene, dispatch next."""
        # 1. Harvest (the mainJobHandle.Complete() analog).
        if self._in_flight is not None:
            if self.compute_async and not self._is_ready(self._in_flight):
                # Frame-skip: job still running (AudioRayTracer.cs:95).
                return self._latest
            if not self.compute_async:
                jax.block_until_ready(self._in_flight)
            self._latest = self._in_flight
            self._in_flight = None
            self.frames_harvested += 1
            if self._dispatch_time is not None:
                self.raytracer_ms = (time.perf_counter()
                                     - self._dispatch_time) * 1e3

        # 2. Publish scene mutations (UpdateJobBatch, cs:154-155).
        t0 = time.perf_counter()
        scene = self.registry.snapshot()
        self.batch_cycle_ms = (time.perf_counter() - t0) * 1e3

        # 3. Dispatch (async; XLA queues the fork-join graph).
        if scene.num_targets > 0:
            self._in_flight = self._step(
                jnp.asarray(origin, jnp.float32), self._directions, scene)
            self._dispatch_time = time.perf_counter()
            self.frames_dispatched += 1
        return self._latest
