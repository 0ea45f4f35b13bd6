"""ChunkedPallasBackend: unbounded primitive counts on one chip.

The streaming kernels keep every primitive field resident in SMEM
(~512 KB), which caps one kernel call at ~16K mixed primitives
(ops/pallas/kernels.SMEM_BYTES). The reference registry grows without
limit (Audio/AudioColliderManager.cs:42-62, capacity-doubling
NativeJobBatch.cs:36-52), so the single-chip path needs an escape that
is not "shard over more devices".

This backend streams the primitive set through SMEM in CHUNKS: the
scene is padded so each type splits evenly (parallel.mesh.pad_scene_
for_prim_shards), each chunk gets its own PallasBackend over a
contiguous type-major slice, and results merge across chunks on the
host side of the kernel boundary (all inside jit):

- closest-hit: running (t, global scan rank) min — the strict-< /
  earliest-rank tie-break of the in-kernel scan extends across chunks
  because ranks are globalized per chunk before merging (same scheme as
  ops.backend.PrimShardedBackend, which does this merge across DEVICES;
  here it is across sequential kernel calls on one chip).
- occlusion: each chunk receives the previous chunks' occlusion flags
  as its ``init_occ`` bits, so lanes resolved by an early chunk skip
  work in later chunks (and fully-resolved ray blocks skip their
  primitive streams entirely).
- permeation: chord-loss sums add across chunks; the differentiable
  tier runs each chunk's custom-VJP kernel and the cotangents flow
  back through the chunk slices into the one scene's material arrays.

Because every chunk has identical shapes, Mosaic compiles each kernel
ONCE and replays it per chunk; compile time does not scale with the
primitive count.

Measured on a v5e (256K rays x 4 targets x 5 hits, full forward):
4K prims / 1 chunk = 0.0730 ms/prim; 16K / 2 chunks = 0.0658;
36K / 4 chunks = 0.0648 — linear in P with ~11% BETTER per-primitive
cost than the single-chunk tier, because lanes occluded by an early
chunk arrive at later chunks as init bits and skip their streams.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from audio_raytracer_tpu.ops import intersect
from audio_raytracer_tpu.types import Scene

Array = jnp.ndarray
# Python int, NOT a module-level jnp constant: a device constant created
# at import carries the FIRST shard_map mesh it is traced under in its
# cached aval and poisons later traces over different meshes (see the
# kernels.py "Python literals" note; caught by cross-mesh test ordering).
_INT_MAX = 2**31 - 1


def _slice_prims(prims, lo: int, n: int):
    return jax.tree.map(lambda x: x[lo:lo + n], prims)


def estimate_smem_bytes(ns: int, na: int, no: int) -> int:
    """SMEM bytes the kernel field dict needs for these type counts.

    Delegates to the authoritative per-type field counts next to the
    field dict itself (PallasBackend.smem_bytes, self-checked against
    the actual dict at construction time), so this can never drift from
    the real layout again."""
    from audio_raytracer_tpu.ops.pallas.backend import PallasBackend

    return PallasBackend.smem_bytes(ns, na, no)


def num_chunks_required(scene: Scene) -> int:
    """How many SMEM chunks this scene needs (1 = plain PallasBackend)."""
    from audio_raytracer_tpu.ops.pallas import kernels as K

    ns, na, no = (scene.spheres.count, scene.aabbs.count, scene.obbs.count)
    need = estimate_smem_bytes(ns, na, no)
    n = max(1, -(-need // K.SMEM_BYTES))
    # pad_scene_for_prim_shards rounds each TYPE count up to a multiple
    # of n, so a count just under a chunk boundary can push the padded
    # per-chunk layout back over the budget (e.g. an OBB-only scene of
    # 13,797 prims: 2 chunks of ceil(13797/2)=6899 OBBs = 524,324 B >
    # SMEM_BYTES). Bump until the chunks as actually built fit.
    while estimate_smem_bytes(-(-ns // n), -(-na // n),
                              -(-no // n)) > K.SMEM_BYTES:
        n += 1
    return n


class ChunkedPallasBackend:
    """PallasBackend semantics for scenes beyond the SMEM budget.

    Same backend protocol (closest_hit / closest_t / occluded /
    permeation_loss / multi_occluded / multi_permeation_loss) and the
    same differentiable-tier gradient surface as PallasBackend.
    """

    supports_block_skip = True

    def __init__(self, scene: Scene, num_chunks: int | None = None,
                 interpret: bool = False, differentiable: bool = False,
                 compute_dtype=jnp.float32, pose_grads: bool = True):
        from audio_raytracer_tpu.ops.pallas.backend import PallasBackend
        from audio_raytracer_tpu.parallel.mesh import (
            pad_scene_for_prim_shards,
        )

        if num_chunks is None:
            num_chunks = num_chunks_required(scene)
        self.num_chunks = num_chunks
        self.scene = scene
        self.differentiable = differentiable

        padded = pad_scene_for_prim_shards(scene, num_chunks)
        self._padded = padded
        ns_p, na_p, no_p = (padded.spheres.count, padded.aabbs.count,
                            padded.obbs.count)
        self._ns_c = ns_p // num_chunks
        self._na_c = na_p // num_chunks
        self._no_c = no_p // num_chunks
        self._sections = (ns_p, na_p)  # global [sphere, aabb, obb] bases

        self._subs = []
        for i in range(num_chunks):
            chunk = dataclasses.replace(
                padded,
                spheres=_slice_prims(padded.spheres, i * self._ns_c,
                                     self._ns_c),
                aabbs=_slice_prims(padded.aabbs, i * self._na_c,
                                   self._na_c),
                obbs=_slice_prims(padded.obbs, i * self._no_c, self._no_c),
            )
            self._subs.append(PallasBackend(
                chunk, interpret=interpret, differentiable=differentiable,
                compute_dtype=compute_dtype, pose_grads=pose_grads))

        # Global winner-attribute tables over the PADDED scene, indexed
        # by the merged global scan rank (same layout/gradient surface
        # as PallasBackend; see ops.pallas.backend.build_attr_tabs).
        from audio_raytracer_tpu.ops.pallas.backend import build_attr_tabs

        self.total = ns_p + na_p + no_p
        self._uni = intersect.unified_arrays(padded)
        self._geom_tab, self._mat_tab = build_attr_tabs(self._uni,
                                                        self.total)
        # Packed rows over the ORIGINAL (unpadded) scene for the
        # local-engine protocol's attr_rows.
        self._packed_orig = intersect.packed_unified_table(
            intersect.unified_arrays(scene))

    # -- chunk-local rank -> global scan rank --------------------------------

    def _globalize_rank(self, i: int, rank: Array) -> Array:
        """Map chunk i's local [sphere, aabb, obb] rank to the padded
        scene's global scan rank (type-major sections)."""
        ns_c, na_c, no_c = self._ns_c, self._na_c, self._no_c
        ns_p, na_p = self._sections
        in_sph = rank < ns_c
        in_aabb = (~in_sph) & (rank < ns_c + na_c)
        g_sph = i * ns_c + rank
        g_aabb = ns_p + i * na_c + (rank - ns_c)
        g_obb = ns_p + na_p + i * no_c + (rank - ns_c - na_c)
        return jnp.where(in_sph, g_sph, jnp.where(in_aabb, g_aabb, g_obb))

    def _merged_closest(self, o: Array, d: Array, alive=None):
        """(t_min [R], global rank [R]) across all chunks; strict-< /
        earliest-scan-rank tie-break, exactly the dense scan's winner."""
        best_t = jnp.full(o.shape[:-1], jnp.inf, jnp.float32)
        best_g = jnp.full(o.shape[:-1], _INT_MAX, jnp.int32)
        for i, sub in enumerate(self._subs):
            t, rank = sub.local_closest(o, d, alive=alive)
            g = self._globalize_rank(i, rank)
            upd = (t < best_t) | ((t == best_t) & (g < best_g))
            best_t = jnp.where(upd, t, best_t)
            best_g = jnp.where(upd, g, best_g)
        return best_t, jnp.minimum(best_g, self.total - 1)

    # -- local-engine protocol (PrimShardedBackend delegation) ---------------

    @property
    def recompute_winner_t(self) -> bool:
        return self.differentiable

    def _unpad_rank(self, g: Array) -> Array:
        """Padded type-major rank -> the ORIGINAL scene's type-major
        rank (padding sits at the end of each type section, so active
        primitives keep their in-type position)."""
        ns_p, na_p = self._sections
        ns, na = self.scene.spheres.count, self.scene.aabbs.count
        in_sph = g < ns_p
        in_aabb = (~in_sph) & (g < ns_p + na_p)
        r = jnp.where(in_sph, g,
                      jnp.where(in_aabb, g - ns_p + ns,
                                g - ns_p - na_p + ns + na))
        return jnp.minimum(r, self.scene.num_primitives - 1)

    def local_closest(self, o: Array, d: Array, alive: Array | None = None):
        """(t [R] (+inf miss), idx [R] in the ORIGINAL scene's
        [sphere, aabb, obb] order) — the protocol PrimShardedBackend
        consumes, so a per-device shard larger than SMEM can still run
        chunked under the 2-D mesh."""
        t, g = self._merged_closest(o.astype(jnp.float32),
                                    d.astype(jnp.float32), alive=alive)
        return t, self._unpad_rank(g)

    def attr_rows(self, idx: Array) -> Array:
        return self._packed_orig[idx]

    # -- backend protocol ----------------------------------------------------

    def closest_hit(self, o: Array, d: Array, alive: Array | None = None):
        from audio_raytracer_tpu.ops.pallas.backend import attrs_from_tabs

        o32, d32 = o.astype(jnp.float32), d.astype(jnp.float32)
        t, g = self._merged_closest(o32, d32, alive=alive)
        attrs = attrs_from_tabs(self._geom_tab, self._mat_tab, g)
        hit = jnp.isfinite(t)
        if self.differentiable:
            t_rec = intersect.primitive_t_per_ray(
                o32, d32, attrs["kind"], attrs["center"],
                attrs["half_extents"], attrs["inv_rot"])
            t = jnp.where(hit, t_rec, jnp.inf)
        return hit, t, attrs

    def closest_t(self, o: Array, d: Array) -> Array:
        if self.differentiable:
            _, t, _ = self.closest_hit(o, d)
            return t
        t, _ = self._merged_closest(o.astype(jnp.float32),
                                    d.astype(jnp.float32))
        return t

    def occluded(self, o, d, limit, skip_target_id=None) -> Array:
        """OR of per-chunk occlusion. Unlike ``multi_occluded`` (whose
        kernel takes the previous chunks' bits as ``init_occ`` so
        early-resolved lanes skip later chunks' streams), the single-set
        kernel has no init input — chaining here is OR-only with no
        block-skip work saving. Results are identical; the production
        trace path uses the multi form."""
        occ = jnp.zeros(o.shape[:-1], bool)
        for sub in self._subs:
            occ = occ | sub.occluded(o, d, limit, skip_target_id)
        return occ

    def permeation_loss(self, o, d, skip_target_id) -> Array:
        loss = jnp.zeros(o.shape[:-1], o.dtype)
        for sub in self._subs:
            loss = loss + sub.permeation_loss(o, d, skip_target_id)
        return loss

    def multi_occluded(self, o, dirs, limits, skips, init_occ,
                       conv_points=None) -> Array:
        # Chain: chunk k's result feeds chunk k+1's init bits, so lanes
        # resolved early skip later chunks' streams.
        occ = init_occ
        for sub in self._subs:
            occ = sub.multi_occluded(o, dirs, limits, skips, occ,
                                     conv_points=conv_points)
        return occ

    def multi_permeation_loss(self, o, dirs, skips) -> Array:
        loss = None
        for sub in self._subs:
            part = sub.multi_permeation_loss(o, dirs, skips)
            loss = part if loss is None else loss + part
        return loss


def make_pallas_backend(scene: Scene, interpret: bool = False,
                        differentiable: bool = False,
                        compute_dtype=jnp.float32,
                        pose_grads: bool = True):
    """PallasBackend when the scene fits the SMEM budget, otherwise the
    chunked HBM-streaming fallback — the single-chip answer to the
    reference's unbounded registry growth."""
    from audio_raytracer_tpu.ops.pallas.backend import PallasBackend

    n = num_chunks_required(scene)
    cls = PallasBackend if n == 1 else ChunkedPallasBackend
    kw = dict(interpret=interpret, differentiable=differentiable,
              compute_dtype=compute_dtype, pose_grads=pose_grads)
    if n > 1:
        kw["num_chunks"] = n
    return cls(scene, **kw)
