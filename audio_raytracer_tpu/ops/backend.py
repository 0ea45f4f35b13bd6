"""Intersection backends: one trace loop, swappable closest-hit engines.

``trace``/``permeation`` are written against this protocol so the same
bounce-loop semantics run on:

- ``DenseBackend``   — every device sees all primitives (jnp baseline; the
                       Pallas kernels slot in here later as a drop-in).
- ``PrimShardedBackend`` — primitives sharded over a mesh axis; closest-hit
                       is a pmin merge with scan-order tie-breaking, hit
                       attributes are recovered with a one-shard psum
                       broadcast, occlusion is a pmax-any, permeation loss
                       a psum. This is the 2-D rays x prims sharding of
                       SURVEY.md §2.7 (the reference's analog: every thread
                       reads the full collider arrays; here we split them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_raytracer_tpu.ops import intersect
from audio_raytracer_tpu.types import Scene

Array = jnp.ndarray

_ATTR_KEYS = ("kind", "center", "half_extents", "inv_rot", "absorption", "echo")
_INT_MAX = jnp.int32(2**31 - 1)


class DenseBackend:
    """All primitives visible locally (single device or replicated)."""

    def __init__(self, scene: Scene):
        self.scene = scene
        self._uni = intersect.unified_arrays(scene) \
            if scene.num_primitives else None

    def closest_hit(self, o: Array, d: Array):
        """Returns (hit [R], t [R], attrs dict of per-ray hit attributes)."""
        hit, t, idx = intersect.closest_hit(o, d, self.scene)
        if self._uni is None:
            z3 = jnp.zeros(o.shape, o.dtype)
            attrs = dict(kind=jnp.zeros(t.shape, jnp.int32), center=z3,
                         half_extents=z3,
                         inv_rot=jnp.zeros(o.shape[:-1] + (4,), o.dtype),
                         absorption=jnp.zeros_like(t),
                         echo=jnp.zeros_like(t))
        else:
            attrs = {k: self._uni[k][idx] for k in _ATTR_KEYS}
        return hit, t, attrs

    def closest_t(self, o: Array, d: Array) -> Array:
        if self.scene.num_primitives == 0:
            return jnp.full(o.shape[:-1], jnp.inf, o.dtype)
        t_grid = intersect.scene_t_grid(o, d, self.scene)
        return jnp.min(t_grid, axis=-1)

    def occluded(self, o, d, limit, skip_target_id=None) -> Array:
        if self.scene.num_primitives == 0:
            return jnp.zeros(o.shape[:-1], bool)
        return intersect.any_hit_within(o, d, limit, self.scene,
                                        skip_target_id)

    def permeation_loss(self, o, d, skip_target_id) -> Array:
        if self.scene.num_primitives == 0:
            return jnp.zeros(o.shape[:-1], o.dtype)
        return intersect.permeation_loss(o, d, self.scene, skip_target_id)


class PrimShardedBackend:
    """Primitive axis sharded over mesh axis ``axis_name``.

    ``scene`` is the LOCAL shard (even per-type split; pad with inactive
    primitives via parallel.mesh.pad_scene_for_prim_shards). Tie-breaking
    reproduces the reference scan order globally: local concat order is
    type-major ([sphere, aabb, obb]) and each shard holds a contiguous
    slice of each type array, so a global "scan rank" is local rank +
    per-type shard offset; the cross-shard winner is the min (t, rank).
    """

    def __init__(self, scene: Scene, axis_name: str, num_shards: int):
        self.scene = scene
        self.axis = axis_name
        self.num_shards = num_shards
        self._uni = intersect.unified_arrays(scene) \
            if scene.num_primitives else None

    def _global_ranks(self):
        """[P_local] global scan rank of each local primitive."""
        s = jax.lax.axis_index(self.axis)
        ns, na, nb = (self.scene.spheres.count, self.scene.aabbs.count,
                      self.scene.obbs.count)
        gs, ga = ns * self.num_shards, na * self.num_shards
        ranks = jnp.concatenate([
            s * ns + jnp.arange(ns, dtype=jnp.int32),
            gs + s * na + jnp.arange(na, dtype=jnp.int32),
            gs + ga + s * nb + jnp.arange(nb, dtype=jnp.int32),
        ])
        return ranks

    def closest_hit(self, o: Array, d: Array):
        t_grid = intersect.scene_t_grid(o, d, self.scene)  # [R, P_local]
        idx = jnp.argmin(t_grid, axis=-1).astype(jnp.int32)
        t_loc = jnp.min(t_grid, axis=-1)
        rank_loc = self._global_ranks()[idx]

        t_min = jax.lax.pmin(t_loc, self.axis)
        cand = (t_loc == t_min) & jnp.isfinite(t_loc)
        rank = jnp.where(cand, rank_loc, _INT_MAX)
        rank_min = jax.lax.pmin(rank, self.axis)
        winner = cand & (rank_loc == rank_min)

        attrs_loc = {k: self._uni[k][idx] for k in _ATTR_KEYS}
        attrs = {}
        for k, v in attrs_loc.items():
            compute_dtype = jnp.float32 if v.dtype != jnp.int32 else jnp.int32
            w = winner[..., None] if v.ndim > winner.ndim else winner
            contrib = jnp.where(w, v, 0).astype(compute_dtype)
            attrs[k] = jax.lax.psum(contrib, self.axis).astype(v.dtype)
        hit = jnp.isfinite(t_min)
        return hit, t_min, attrs

    def closest_t(self, o: Array, d: Array) -> Array:
        t_grid = intersect.scene_t_grid(o, d, self.scene)
        return jax.lax.pmin(jnp.min(t_grid, axis=-1), self.axis)

    def occluded(self, o, d, limit, skip_target_id=None) -> Array:
        local = intersect.any_hit_within(o, d, limit, self.scene,
                                         skip_target_id)
        return jax.lax.pmax(local.astype(jnp.int32), self.axis) > 0

    def permeation_loss(self, o, d, skip_target_id) -> Array:
        local = intersect.permeation_loss(o, d, self.scene, skip_target_id)
        return jax.lax.psum(local, self.axis)
