"""Permeation: sound power transmitted *through* geometry to each target.

Reference: Jobs/AudioPermeationJobBatched.cs. Per ray: find the first hit
point of the primary ray; from an epsilon-offset of that point, integrate
(chord length through each collider) x material.Density toward every
audio target; the per-(batch, target) output is
``ray_count * strength - total_loss``.

Parity quirk (kept deliberately): the reference writes that value to
``PermeationPowerRemains[batchId * T + target]`` inside the per-ray loop
(cs:85), so within an accumulation batch every hitting ray OVERWRITES the
slot — the surviving value belongs to the LAST ray in the batch whose
primary ray hit anything; batches where no ray hits keep the reset value 0
(cs:43-46). We reproduce that with a segment-max over hitting ray indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_raytracer_tpu.ops import intersect
from audio_raytracer_tpu.ops.backend import DenseBackend
from audio_raytracer_tpu.ops.trace import accum_batch_ids
from audio_raytracer_tpu.types import Scene, TraceConfig

Array = jnp.ndarray


def permeation(origin: Array, directions: Array, scene: Scene,
               cfg: TraceConfig, backend=None,
               total_ray_count: int | None = None,
               first_t: Array | None = None) -> Array:
    """[B, T] permeation power remains per (accum batch, target).

    ``total_ray_count`` overrides the RayDirections.Length term of
    cs:260 when ``directions`` is a shard of a larger global batch.
    ``first_t`` (optional, [R]): precomputed primary-ray first-hit
    distance (TraceResult.first_hit_t) — skips re-scanning the scene.
    """
    R = directions.shape[0]
    R_total = total_ray_count if total_ray_count is not None else R
    T = scene.num_targets
    B = cfg.num_accum_batches
    if T == 0 or (backend is None and scene.num_primitives == 0):
        return jnp.zeros((B, T), directions.dtype)
    if backend is None:
        backend = DenseBackend(scene)

    o = jnp.broadcast_to(jnp.asarray(origin, directions.dtype), (R, 3))
    d = directions

    # First hit of the primary ray (closest distance only; cs:101-141),
    # shared with the main trace when available.
    t = first_t if first_t is not None else backend.closest_t(o, d)
    hit = jnp.isfinite(t)

    # Last-hitting-ray-in-batch selection FIRST (the overwrite quirk):
    # only the last hitting ray of each accumulation batch ever survives
    # into PermeationPowerRemains (cs:85), so the chord integration runs
    # on just those B rays — not the full [R, T] grid. At the 1M x 4K
    # headline this turns the permeation pass from a full primitive
    # stream (~165 ms) into one ray block (<1 ms), bit-identical output.
    batch_ids = accum_batch_ids(R, B)
    ray_idx = jnp.arange(R, dtype=jnp.int32)
    marker = jnp.where(hit, ray_idx + 1, 0)  # 0 = "no hit"
    last_plus1 = jax.ops.segment_max(marker, batch_ids, num_segments=B)
    any_hit_in_batch = last_plus1 > 0
    gather_idx = jnp.maximum(last_plus1 - 1, 0)  # [B]

    d_sel = d[gather_idx]  # [B, 3]
    t_sel = jnp.where(any_hit_in_batch, t[gather_idx], 0.0)
    o_sel = o[gather_idx]
    p = o_sel + d_sel * t_sel[..., None]
    offset_point = p - d_sel * cfg.epsilon  # cs:72

    # All T target rays in one fused primitive stream (the per-target
    # loop of cs:57-89 vectorized over targets).
    dirs = []
    for ti in range(T):
        to_target = scene.target_positions[ti] - offset_point  # [B, 3]
        dist = intersect.safe_norm(to_target)
        dirs.append(to_target / dist[..., None])
    losses = backend.multi_permeation_loss(offset_point, dirs,
                                           tuple(range(T)))  # [B, T]
    values = R_total * cfg.permeation_strength_per_ray - losses  # cs:260
    return jnp.where(any_hit_in_batch[:, None], values, 0.0)
