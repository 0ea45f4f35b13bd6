"""Benchmark harness: rays/s/chip on the flagship forward (and backward).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline note: the reference (FirePixel8422/Audio-Raytracer) publishes no
benchmark numbers (BASELINE.md). The only throughput its defaults define
is the real-time envelope: 500 rays/frame at 60 fps = 30,000 rays/s on a
desktop CPU (Player.prefab rayCount, Unity frame loop). ``vs_baseline``
is measured rays/s against that envelope.

Default workload approximates BASELINE config 3 at single-chip scale:
mixed AABB/OBB/sphere scene, multi-bounce (depth 4), echo + muffle +
permeation; scale up with --rays/--prims toward the 1M x 4K headline.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REFERENCE_ENVELOPE_RAYS_PER_S = 30_000.0  # 500 rays x 60 fps (see above)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=262_144)
    p.add_argument("--prims", type=int, default=512)
    p.add_argument("--targets", type=int, default=4)
    p.add_argument("--bounces", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--mode", choices=["fwd", "fwd_bwd"], default="fwd")
    p.add_argument("--backend", choices=["auto", "jnp", "pallas"],
                   default="auto")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from audio_raytracer_tpu.models.raytracer import forward, random_scene
    from audio_raytracer_tpu.ops.fibonacci import fibonacci_directions
    from audio_raytracer_tpu.types import TraceConfig

    n_s = args.prims // 4
    n_o = args.prims // 4
    n_a = args.prims - n_s - n_o

    cfg = TraceConfig(ray_count=args.rays, max_bounces=args.bounces,
                      max_ray_life=300.0, max_muffle_hit_distance=250.0)
    scene = random_scene(jax.random.key(0), num_spheres=n_s, num_aabbs=n_a,
                         num_obbs=n_o, num_targets=args.targets,
                         extent=60.0, size_range=(0.5, 4.0))
    origin = jnp.zeros((3,), jnp.float32)
    dirs = fibonacci_directions(args.rays)

    backend = args.backend
    if backend == "auto":
        backend = "pallas" if jax.devices()[0].platform != "cpu" else "jnp"

    if args.mode == "fwd":
        @jax.jit
        def step(origin, dirs, scene):
            _, settings = forward(origin, dirs, scene, cfg, backend=backend)
            return settings

        metric = "rays_per_s_per_chip_fwd"
    else:
        from audio_raytracer_tpu.models.differentiable import (
            Loudness,
            SceneParams,
            loudness_loss,
        )

        params = SceneParams.from_scene(scene)
        target = Loudness(muffle=jnp.full((args.targets,), 0.3),
                          permeation=jnp.full((args.targets,), 0.2),
                          reverb_energy=jnp.asarray(0.05))

        backend_fn = None
        if backend == "pallas":
            from audio_raytracer_tpu.ops.pallas import PallasBackend

            def backend_fn(s):
                return PallasBackend(s, differentiable=True)

        @jax.jit
        def step(origin, dirs, scene):
            return jax.grad(loudness_loss)(params, scene, origin, dirs, cfg,
                                           target, backend_fn=backend_fn)

        metric = "rays_per_s_per_chip_fwd_bwd"

    import numpy as np

    def drain(out):
        """Force completion via a host transfer: through the device relay
        block_until_ready returns before compute finishes; fetching a
        value cannot."""
        return float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])

    # Warmup / compile.
    drain(step(origin, dirs, scene))

    # Time with distinct inputs and a true sync per iteration.
    times = []
    for i in range(args.iters):
        o_i = origin + jnp.float32(i) * 1e-6
        t0 = time.perf_counter()
        drain(step(o_i, dirs, scene))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]  # median

    rays_per_s = args.rays / dt
    print(json.dumps({
        "metric": metric,
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REFERENCE_ENVELOPE_RAYS_PER_S, 2),
    }))
    print(f"# step {dt * 1e3:.2f} ms | {args.rays} rays x {args.prims} prims "
          f"x {args.bounces + 1} hits x {args.targets} targets | "
          f"device {jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
