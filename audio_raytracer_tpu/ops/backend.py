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
# Python int, NOT a module-level jnp constant: device constants created
# at import cache the first shard_map mesh they're traced under and
# poison later traces over different meshes.
_INT_MAX = 2**31 - 1

# "Skip no audio target" sentinel for multi-set occlusion / permeation
# (real target ids are >= 0; -1 means "prim not owned", so the sentinel
# must be far below -1 to never match).
NO_SKIP = -(2**31)


def _skip_or_none(skip: int):
    return None if skip < 0 else skip


class DenseBackend:
    """All primitives visible locally (single device or replicated)."""

    # The jnp t_grid path carries tangents natively; no winner recompute
    # is needed when this engine sits under a PrimShardedBackend.
    recompute_winner_t = False

    def __init__(self, scene: Scene):
        self.scene = scene
        self._uni = intersect.unified_arrays(scene) \
            if scene.num_primitives else None
        self._packed = (intersect.packed_unified_table(self._uni)
                        if self._uni is not None else None)

    def local_closest(self, o: Array, d: Array, alive: Array | None = None):
        """(t [R] (+inf miss), idx [R] int32 in [sphere,aabb,obb] order).

        The local-engine protocol consumed by PrimShardedBackend.
        ``alive`` is accepted for protocol parity and ignored — the dense
        [R, P] grid computes every lane regardless; callers mask."""
        _, t, idx = intersect.closest_hit(o, d, self.scene)
        return t, idx

    def attr_rows(self, idx: Array) -> Array:
        """[..., 16] packed winner-attribute rows for local indices."""
        return self._packed[idx]

    def closest_hit(self, o: Array, d: Array, alive: Array | None = None):
        """Returns (hit [R], t [R], attrs dict of per-ray hit attributes).

        ``alive`` is ignored here (see local_closest)."""
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

    def multi_occluded(self, o, dirs, limits, skips, init_occ,
                       conv_points=None) -> Array:
        """Fused occlusion over S ray sets sharing one origin.

        o: [R,3]; dirs: list of S [R,3]; limits: [R,S]; skips: static
        tuple (NO_SKIP or a target id per set); init_occ: [R,S] bool
        pre-resolved lanes. ``conv_points`` ([S, 3] per-set ray
        endpoint) is a culling hint the kernel tier uses; the dense
        [R, P] grid computes everything regardless and ignores it.
        Returns [R,S] bool (init lanes come back True). The jnp tier
        composes per-set tests; the Pallas tier runs one primitive
        stream (ops.pallas.fused.multi_any_hit)."""
        cols = [
            self.occluded(o, dirs[s], limits[..., s],
                          skip_target_id=_skip_or_none(skips[s]))
            | init_occ[..., s]
            for s in range(len(dirs))
        ]
        return jnp.stack(cols, axis=-1)

    def multi_permeation_loss(self, o, dirs, skips) -> Array:
        """[R, S] permeation chord-loss sums for S target ray sets."""
        cols = [
            self.permeation_loss(o, dirs[s],
                                 skip_target_id=_skip_or_none(skips[s]))
            for s in range(len(dirs))
        ]
        return jnp.stack(cols, axis=-1)


class PrimShardedBackend:
    """Primitive axis sharded over mesh axis ``axis_name``.

    ``scene`` is the LOCAL shard (even per-type split; pad with inactive
    primitives via parallel.mesh.pad_scene_for_prim_shards). Tie-breaking
    reproduces the reference scan order globally: local concat order is
    type-major ([sphere, aabb, obb]) and each shard holds a contiguous
    slice of each type array, so a global "scan rank" is local rank +
    per-type shard offset; the cross-shard winner is the min (t, rank).

    Local intersection work is delegated to an ``engine`` (the local-
    engine protocol: local_closest / attr_rows / closest_t / occluded /
    permeation_loss) — DenseBackend (jnp t_grid) by default, or a
    PallasBackend so each shard streams its primitive slice through the
    TPU kernels; this class only owns the cross-shard collectives.
    """

    def __init__(self, scene: Scene, axis_name: str, num_shards: int,
                 engine=None):
        self.scene = scene
        self.axis = axis_name
        self.num_shards = num_shards
        self.engine = DenseBackend(scene) if engine is None else engine

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

    def _merge_min(self, t_loc: Array, rank_loc: Array):
        """Cross-shard (t, global-rank) min with scan-order tie-break.

        The pmin votes run on stop-gradded values (pmin has no AD rule);
        returns (t_min sg'd, winner mask, t_diff) where ``t_diff`` equals
        t_min in value but carries the winning shard's tangents.
        """
        ts = jax.lax.stop_gradient(t_loc)
        t_min = jax.lax.pmin(ts, self.axis)
        cand = (ts == t_min) & jnp.isfinite(ts)
        rank = jnp.where(cand, rank_loc, _INT_MAX)
        rank_min = jax.lax.pmin(rank, self.axis)
        winner = cand & (rank_loc == rank_min)
        t_diff = t_min + jax.lax.psum(
            jnp.where(winner, t_loc - ts, 0.0), self.axis)
        return t_min, winner, t_diff

    @property
    def supports_block_skip(self) -> bool:
        """Delegated: aliveness compaction helps iff the local engine's
        kernels can skip fully-dead ray blocks."""
        return getattr(self.engine, "supports_block_skip", False)

    def closest_hit(self, o: Array, d: Array, alive: Array | None = None):
        t_loc, idx = self.engine.local_closest(o, d, alive=alive)
        rank_loc = self._global_ranks()[idx]
        t_min, winner, t_diff = self._merge_min(t_loc, rank_loc)

        # One psum broadcast of the winner's packed attribute row
        # (zeros contributed by losing shards).
        rows_loc = self.engine.attr_rows(idx).astype(jnp.float32)
        rows = jax.lax.psum(jnp.where(winner[..., None], rows_loc, 0.0),
                            self.axis)
        attrs = intersect.unpack_attr_rows(rows)
        hit = jnp.isfinite(t_min)
        if getattr(self.engine, "recompute_winner_t", False):
            # Winner-recompute so the merged distance carries tangents to
            # poses even when the local engine's t is stop-gradded
            # (PallasBackend kernels).
            t_rec = intersect.primitive_t_per_ray(
                o.astype(jnp.float32), d.astype(jnp.float32), attrs["kind"],
                attrs["center"], attrs["half_extents"], attrs["inv_rot"])
            t_out = jnp.where(hit, t_rec, jnp.inf)
        else:
            t_out = t_diff  # jnp engine: local t already carries tangents
        return hit, t_out, attrs

    def closest_t(self, o: Array, d: Array) -> Array:
        if getattr(self.engine, "recompute_winner_t", False):
            _, t, _ = self.closest_hit(o, d)
            return t
        t_loc, idx = self.engine.local_closest(o, d)
        _, _, t_diff = self._merge_min(t_loc, self._global_ranks()[idx])
        return t_diff

    def occluded(self, o, d, limit, skip_target_id=None) -> Array:
        local = self.engine.occluded(o, d, limit, skip_target_id)
        return jax.lax.pmax(local.astype(jnp.int32), self.axis) > 0

    def permeation_loss(self, o, d, skip_target_id) -> Array:
        local = self.engine.permeation_loss(o, d, skip_target_id)
        return jax.lax.psum(local, self.axis)

    def multi_occluded(self, o, dirs, limits, skips, init_occ,
                       conv_points=None) -> Array:
        local = self.engine.multi_occluded(o, dirs, limits, skips, init_occ,
                                           conv_points=conv_points)
        return jax.lax.pmax(local.astype(jnp.int32), self.axis) > 0

    def multi_permeation_loss(self, o, dirs, skips) -> Array:
        local = self.engine.multi_permeation_loss(o, dirs, skips)
        return jax.lax.psum(local, self.axis)
