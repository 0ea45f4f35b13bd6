"""SceneRegistry: Python facade over the native C++ registry.

The authoring/runtime API of the reference's component layer
(AudioCollider.cs self-registration, AudioColliderManager /
AudioTargetManager), re-shaped for a functional compute path: mutations
go to the native next-batch; ``snapshot()`` publishes the job batch and
materializes an immutable, capacity-padded Scene pytree with static
shapes (so jit doesn't recompile on every add/remove — only on
capacity growth, in powers of two).
"""

from __future__ import annotations

import ctypes
import math

import jax.numpy as jnp
import numpy as np

from audio_raytracer_tpu.runtime import native
from audio_raytracer_tpu.types import Aabbs, Materials, Obbs, Scene, Spheres

SPHERE, AABB, OBB = 0, 1, 2
_STRIDE = {SPHERE: 8, AABB: 10, OBB: 14}


def _row(*vals):
    arr = (ctypes.c_float * len(vals))(*[float(v) for v in vals])
    return arr


def _pow2_at_least(n, floor=8):
    if n <= floor:
        return floor
    return 1 << math.ceil(math.log2(n))


class SceneRegistry:
    """Mutable scene with a stable snapshot path.

    Handles returned by add_* are stable across removals (the native side
    keeps the dense-slot indirection; the reference instead patched
    component ids through events, AudioColliderManager.cs:64-105).
    """

    def __init__(self):
        self._lib = native.load()
        self._reg = ctypes.c_void_p(self._lib.art_registry_create())
        self._snapshot_version = None
        self._cached_scene = None

    def close(self):
        if self._reg:
            self._lib.art_registry_destroy(self._reg)
            self._reg = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # -- Authoring API ------------------------------------------------------

    def add_sphere(self, center, radius, material=(0.0, 1.0, 1.0),
                   target_id=-1) -> int:
        a, d, e = material
        return self._lib.art_add(self._reg, SPHERE, _row(
            *center, radius, a, d, e, target_id))

    def add_aabb(self, center, half_extents, material=(0.0, 1.0, 1.0),
                 target_id=-1) -> int:
        a, d, e = material
        return self._lib.art_add(self._reg, AABB, _row(
            *center, *half_extents, a, d, e, target_id))

    def add_obb(self, center, half_extents, inv_rot, material=(0.0, 1.0, 1.0),
                target_id=-1) -> int:
        """``inv_rot``: xyzw quaternion, pre-inverted like the reference
        bake (AudioOBBCollider.cs:59)."""
        a, d, e = material
        return self._lib.art_add(self._reg, OBB, _row(
            *center, *half_extents, *inv_rot, a, d, e, target_id))

    def update_sphere(self, handle, center, radius, material=(0.0, 1.0, 1.0),
                      target_id=-1):
        a, d, e = material
        rc = self._lib.art_update(self._reg, handle, _row(
            *center, radius, a, d, e, target_id))
        if rc != 0:
            raise KeyError(f"invalid handle {handle}")

    def update_aabb(self, handle, center, half_extents,
                    material=(0.0, 1.0, 1.0), target_id=-1):
        a, d, e = material
        rc = self._lib.art_update(self._reg, handle, _row(
            *center, *half_extents, a, d, e, target_id))
        if rc != 0:
            raise KeyError(f"invalid handle {handle}")

    def update_obb(self, handle, center, half_extents, inv_rot,
                   material=(0.0, 1.0, 1.0), target_id=-1):
        a, d, e = material
        rc = self._lib.art_update(self._reg, handle, _row(
            *center, *half_extents, *inv_rot, a, d, e, target_id))
        if rc != 0:
            raise KeyError(f"invalid handle {handle}")

    def remove(self, handle):
        rc = self._lib.art_remove(self._reg, handle)
        if rc != 0:
            raise KeyError(f"invalid handle {handle}")

    def add_target(self, position) -> int:
        return self._lib.art_add_target(self._reg, *[float(v)
                                                     for v in position])

    def set_target_position(self, idx, position):
        """Per-frame moving-source sync (AudioTargetRT.cs:53-62): the
        new position reaches the kernels — and TargetSettings.
        perceived_position — at the next snapshot() publish."""
        rc = self._lib.art_set_target_position(
            self._reg, idx, *[float(v) for v in position])
        if rc != 0:
            raise KeyError(f"invalid target {idx}")

    def remove_target(self, idx):
        rc = self._lib.art_remove_target(self._reg, idx)
        if rc != 0:
            raise KeyError(f"invalid target {idx}")

    # -- Snapshot path ------------------------------------------------------

    @property
    def version(self) -> int:
        return self._lib.art_version(self._reg)

    def counts(self):
        c = (ctypes.c_int * 4)()
        self._lib.art_counts(self._reg, c)
        return tuple(c)

    def _job_array(self, type_id, count, stride):
        ptr = self._lib.art_job_data(self._reg, type_id)
        if count == 0:
            return np.zeros((0, stride), np.float32)
        buf = np.ctypeslib.as_array(ptr, shape=(count, stride))
        return np.array(buf)  # copy: the job batch may be republished

    def snapshot(self, pad_pow2: bool = True) -> Scene:
        """Publish the job batch and build a capacity-padded Scene.

        Padded entries are inactive (masked) so jit signatures stay
        stable while the scene mutates; capacities grow in powers of two.
        """
        changed = self._lib.art_update_job_batch(self._reg)
        version = self.version
        if not changed and self._cached_scene is not None \
                and version == self._snapshot_version:
            return self._cached_scene

        ns, na, no, nt = self.counts()
        sp = self._job_array(SPHERE, ns, _STRIDE[SPHERE])
        ab = self._job_array(AABB, na, _STRIDE[AABB])
        ob = self._job_array(OBB, no, _STRIDE[OBB])
        tp = self._job_array(3, nt, 3)

        def build(n, rows, make):
            cap = _pow2_at_least(n) if pad_pow2 else max(n, 1)
            active = np.zeros((cap,), bool)
            active[:n] = True
            return make(rows, cap, active)

        def make_spheres(rows, cap, active):
            full = np.zeros((cap, _STRIDE[SPHERE]), np.float32)
            full[:len(rows)] = rows
            return Spheres(
                center=jnp.asarray(full[:, 0:3]),
                radius=jnp.asarray(full[:, 3]),
                material=Materials(jnp.asarray(full[:, 4]),
                                   jnp.asarray(full[:, 5]),
                                   jnp.asarray(full[:, 6])),
                target_id=jnp.asarray(full[:, 7], jnp.int32),
                active=jnp.asarray(active),
            )

        def make_aabbs(rows, cap, active):
            full = np.zeros((cap, _STRIDE[AABB]), np.float32)
            full[:len(rows)] = rows
            return Aabbs(
                center=jnp.asarray(full[:, 0:3]),
                half_extents=jnp.asarray(full[:, 3:6]),
                material=Materials(jnp.asarray(full[:, 6]),
                                   jnp.asarray(full[:, 7]),
                                   jnp.asarray(full[:, 8])),
                target_id=jnp.asarray(full[:, 9], jnp.int32),
                active=jnp.asarray(active),
            )

        def make_obbs(rows, cap, active):
            full = np.zeros((cap, _STRIDE[OBB]), np.float32)
            full[:, 9] = 1.0  # identity qw on padding
            full[:len(rows)] = rows
            return Obbs(
                center=jnp.asarray(full[:, 0:3]),
                half_extents=jnp.asarray(full[:, 3:6]),
                inv_rot=jnp.asarray(full[:, 6:10]),
                material=Materials(jnp.asarray(full[:, 10]),
                                   jnp.asarray(full[:, 11]),
                                   jnp.asarray(full[:, 12])),
                target_id=jnp.asarray(full[:, 13], jnp.int32),
                active=jnp.asarray(active),
            )

        scene = Scene(
            spheres=build(ns, sp, make_spheres),
            aabbs=build(na, ab, make_aabbs),
            obbs=build(no, ob, make_obbs),
            target_positions=jnp.asarray(tp.reshape(nt, 3)),
        )
        self._cached_scene = scene
        self._snapshot_version = version
        return scene
