"""Unit tests for intersection ops against closed-form cases.

Covers the parity quirks: inside-box returns tFar, sphere near-root
preference, scan-order tie-breaking, muffle target-skip, permeation
chord accumulation without far clamp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_raytracer_tpu.ops import intersect, quaternion
from audio_raytracer_tpu.types import Aabbs, Obbs, Scene, Spheres


def _r(x):
    return jnp.asarray(x, jnp.float32).reshape(1, 3)


class TestAabb:
    def test_direct_hit(self):
        t = intersect.aabb_t(_r([0, 0, -10]), _r([0, 0, 1]),
                             jnp.zeros((1, 3)), jnp.ones((1, 3)))
        np.testing.assert_allclose(np.asarray(t), [[9.0]], rtol=1e-6)

    def test_miss(self):
        t = intersect.aabb_t(_r([5, 0, -10]), _r([0, 0, 1]),
                             jnp.zeros((1, 3)), jnp.ones((1, 3)))
        assert np.isinf(np.asarray(t)).all()

    def test_inside_returns_tfar(self):
        # Reference quirk: origin inside box -> distance to the exit face.
        t = intersect.aabb_t(_r([0, 0, 0]), _r([0, 0, 1]),
                             jnp.zeros((1, 3)), jnp.ones((1, 3)) * 2.0)
        np.testing.assert_allclose(np.asarray(t), [[2.0]], rtol=1e-6)

    def test_behind_is_miss(self):
        t = intersect.aabb_t(_r([0, 0, 10]), _r([0, 0, 1]),
                             jnp.zeros((1, 3)), jnp.ones((1, 3)))
        assert np.isinf(np.asarray(t)).all()

    def test_diagonal(self):
        d = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
        t = intersect.aabb_t(_r([-5, -5, 0]), _r(d),
                             jnp.zeros((1, 3)), jnp.ones((1, 3)))
        np.testing.assert_allclose(np.asarray(t), [[4 * np.sqrt(2)]], rtol=1e-5)

    def test_inactive_masked(self):
        t = intersect.aabb_t(_r([0, 0, -10]), _r([0, 0, 1]),
                             jnp.zeros((1, 3)), jnp.ones((1, 3)),
                             active=jnp.zeros((1,), bool))
        assert np.isinf(np.asarray(t)).all()


class TestSphere:
    def test_direct_hit(self):
        t = intersect.sphere_t(_r([0, 0, -10]), _r([0, 0, 1]),
                               jnp.zeros((1, 3)), jnp.ones((1,)) * 2.0)
        np.testing.assert_allclose(np.asarray(t), [[8.0]], rtol=1e-6)

    def test_inside_hits_far_shell(self):
        t = intersect.sphere_t(_r([0, 0, 0]), _r([0, 0, 1]),
                               jnp.zeros((1, 3)), jnp.ones((1,)) * 3.0)
        np.testing.assert_allclose(np.asarray(t), [[3.0]], rtol=1e-6)

    def test_tangent_grazes(self):
        t = intersect.sphere_t(_r([2, 0, -10]), _r([0, 0, 1]),
                               jnp.zeros((1, 3)), jnp.ones((1,)) * 2.0)
        np.testing.assert_allclose(np.asarray(t), [[10.0]], rtol=1e-4)

    def test_behind_is_miss(self):
        t = intersect.sphere_t(_r([0, 0, 10]), _r([0, 0, 1]),
                               jnp.zeros((1, 3)), jnp.ones((1,)))
        assert np.isinf(np.asarray(t)).all()

    def test_unnormalized_direction_scales(self):
        # a = dot(d,d) handles unnormalized d: t is in direction-lengths.
        t = intersect.sphere_t(_r([0, 0, -10]), _r([0, 0, 2]),
                               jnp.zeros((1, 3)), jnp.ones((1,)) * 2.0)
        np.testing.assert_allclose(np.asarray(t), [[4.0]], rtol=1e-6)


class TestObb:
    def test_rotated_box_equivalence(self):
        # 45-degree rotated box about y hit along x: local-frame slab.
        rot = quaternion.from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]),
                                         jnp.asarray(np.pi / 4))
        inv = quaternion.inverse(rot)[None]
        t = intersect.obb_t(_r([-10, 0, 0]), _r([1, 0, 0]),
                            jnp.zeros((1, 3)), jnp.ones((1, 3)), inv)
        # Corner-on: the rotated unit cube's extent along x is sqrt(2).
        np.testing.assert_allclose(np.asarray(t), [[10 - np.sqrt(2)]],
                                   rtol=1e-5)

    def test_identity_matches_aabb(self):
        inv = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
        o, d = _r([3, -9, 1]), _r([-0.2, 1.0, 0.0])
        c = jnp.asarray([[2.0, 0.0, 1.0]])
        h = jnp.asarray([[1.5, 2.0, 1.0]])
        np.testing.assert_allclose(
            np.asarray(intersect.obb_t(o, d, c, h, inv)),
            np.asarray(intersect.aabb_t(o, d, c, h)), rtol=1e-6)


class TestClosestHit:
    def _scene(self):
        spheres = Spheres.build([[0, 0, 5]], [1.0])
        aabbs = Aabbs.build([[0, 0, 8]], [[1, 1, 1]])
        obbs = Obbs.build([[0, 0, 12]], [[1, 1, 1]], [[0, 0, 0, 1]])
        return Scene.build(spheres, aabbs, obbs, [[0, 10, 0]])

    def test_nearest_wins(self):
        scene = self._scene()
        hit, t, idx = intersect.closest_hit(
            _r([0, 0, 0]), _r([0, 0, 1]), scene)
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 4.0, rtol=1e-6)
        assert int(idx[0]) == 0  # the sphere

    def test_tie_break_scan_order(self):
        # Sphere and AABB surfaces at the same distance: sphere (scanned
        # first) must win, replicating strict-< update order.
        spheres = Spheres.build([[0, 0, 6]], [1.0])
        aabbs = Aabbs.build([[0, 0, 6]], [[1, 1, 1]])
        scene = Scene.build(spheres, aabbs, None, [[0, 10, 0]])
        hit, t, idx = intersect.closest_hit(_r([0, 0, 0]), _r([0, 0, 1]), scene)
        assert bool(hit[0]) and int(idx[0]) == 0

    def test_occlusion_respects_limit(self):
        scene = self._scene()
        o, d = _r([0, 0, 0]), _r([0, 0, 1])
        # Limit short of the sphere: unoccluded.
        assert not bool(intersect.any_hit_within(o, d, jnp.asarray([3.0]),
                                                 scene)[0])
        assert bool(intersect.any_hit_within(o, d, jnp.asarray([5.0]),
                                             scene)[0])

    def test_occlusion_skips_target_colliders(self):
        spheres = Spheres.build([[0, 0, 5]], [1.0],
                                target_id=jnp.asarray([0], jnp.int32))
        scene = Scene.build(spheres, None, None, [[0, 0, 5]])
        o, d = _r([0, 0, 0]), _r([0, 0, 1])
        occ_skip = intersect.any_hit_within(o, d, jnp.asarray([10.0]), scene,
                                            skip_target_id=jnp.asarray(0))
        occ_noskip = intersect.any_hit_within(o, d, jnp.asarray([10.0]), scene)
        assert not bool(occ_skip[0])
        assert bool(occ_noskip[0])


class TestPermeationChords:
    def test_aabb_chord(self):
        aabbs = Aabbs.build([[0, 0, 5]], [[1, 1, 2]])
        scene = Scene.build(None, aabbs, None)
        loss = intersect.permeation_loss(_r([0, 0, 0]), _r([0, 0, 1]), scene)
        np.testing.assert_allclose(np.asarray(loss), [4.0], rtol=1e-6)

    def test_sphere_chord(self):
        spheres = Spheres.build([[0, 0, 5]], [2.0])
        scene = Scene.build(spheres, None, None)
        loss = intersect.permeation_loss(_r([0, 0, 0]), _r([0, 0, 1]), scene)
        np.testing.assert_allclose(np.asarray(loss), [4.0], rtol=1e-6)

    def test_density_scales(self):
        from audio_raytracer_tpu.types import Materials
        mat = Materials(jnp.zeros((1,)), jnp.asarray([2.5]), jnp.ones((1,)))
        aabbs = Aabbs.build([[0, 0, 5]], [[1, 1, 2]], material=mat)
        scene = Scene.build(None, aabbs, None)
        loss = intersect.permeation_loss(_r([0, 0, 0]), _r([0, 0, 1]), scene)
        np.testing.assert_allclose(np.asarray(loss), [10.0], rtol=1e-6)

    def test_origin_inside_clamps_entry(self):
        aabbs = Aabbs.build([[0, 0, 0]], [[1, 1, 2]])
        scene = Scene.build(None, aabbs, None)
        loss = intersect.permeation_loss(_r([0, 0, 0]), _r([0, 0, 1]), scene)
        np.testing.assert_allclose(np.asarray(loss), [2.0], rtol=1e-6)

    def test_no_far_clamp_quirk(self):
        # A chord entirely beyond a nearby target still counts (reference
        # has no limit on the permeation interval).
        aabbs = Aabbs.build([[0, 0, 100]], [[1, 1, 5]])
        scene = Scene.build(None, aabbs, None)
        loss = intersect.permeation_loss(_r([0, 0, 0]), _r([0, 0, 1]), scene)
        np.testing.assert_allclose(np.asarray(loss), [10.0], rtol=1e-6)


class TestReflection:
    def test_aabb_face_normal(self):
        n = intersect.reflection_normal(
            _r([0.2, 0.3, -1.0]), jnp.asarray([1]), _r([0, 0, 0]),
            _r([1, 1, 1]), jnp.asarray([[0, 0, 0, 1.0]]))
        np.testing.assert_allclose(np.asarray(n), [[0, 0, -1.0]], atol=1e-6)

    def test_sphere_radial_normal(self):
        n = intersect.reflection_normal(
            _r([0, 0, -2.0]), jnp.asarray([0]), _r([0, 0, 0]),
            _r([2, 2, 2]), jnp.asarray([[0, 0, 0, 1.0]]))
        np.testing.assert_allclose(np.asarray(n), [[0, 0, -1.0]], atol=1e-6)

    def test_reflect(self):
        d = intersect.reflect(_r([1, -1, 0]) / np.sqrt(2), _r([0, 1, 0]))
        np.testing.assert_allclose(np.asarray(d),
                                   np.asarray(_r([1, 1, 0]) / np.sqrt(2)),
                                   atol=1e-6)


class TestQuaternionPacking:
    """halfQuaternion w-reconstruction parity (DataTypes/halfQuaternion.cs)."""

    def test_pack_unpack_roundtrip(self):
        key = jax.random.key(3)
        axis = jax.random.normal(key, (32, 3))
        angle = jax.random.uniform(jax.random.fold_in(key, 1), (32,),
                                   minval=0.0, maxval=2.0 * np.pi)
        q = quaternion.from_axis_angle(axis, angle)
        q2 = quaternion.unpack_xyz(quaternion.pack_xyz(q))
        # q and -q are the same rotation; compare through a rotated vector.
        v = jax.random.normal(jax.random.fold_in(key, 2), (32, 3))
        np.testing.assert_allclose(np.asarray(quaternion.rotate(q, v)),
                                   np.asarray(quaternion.rotate(q2, v)),
                                   rtol=1e-5, atol=1e-5)

    def test_negative_w_canonicalized(self):
        q = quaternion.from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]),
                                       jnp.asarray(3.5))  # w = cos(1.75) < 0
        assert float(q[3]) < 0.0
        q2 = quaternion.unpack_xyz(quaternion.pack_xyz(q))
        assert float(q2[3]) >= 0.0
        v = jnp.asarray([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(quaternion.rotate(q, v)),
                                   np.asarray(quaternion.rotate(q2, v)),
                                   rtol=1e-5, atol=1e-5)


class TestDegenerateRays:
    """safe_dir nudge path + strict-< occlusion boundary (the
    reference's `t < dist` comparison, CanRaySeePoint)."""

    def test_axis_parallel_ray_through_box(self):
        # d.x == 0: the slab division takes the nudge path; the ray is
        # inside the box's x-extent so it still hits.
        aabbs = Aabbs.build([[0.0, 0.0, 5.0]], [[1.0, 1.0, 1.0]])
        scene = Scene.build(None, aabbs, None, None)
        o = _r([0.5, 0.0, 0.0])
        d = _r([0.0, 0.0, 1.0])
        hit, t, _ = intersect.closest_hit(o, d, scene)
        assert bool(hit[0]) and abs(float(t[0]) - 4.0) < 1e-5

    def test_axis_parallel_ray_outside_slab_misses(self):
        aabbs = Aabbs.build([[0.0, 0.0, 5.0]], [[1.0, 1.0, 1.0]])
        scene = Scene.build(None, aabbs, None, None)
        o = _r([2.5, 0.0, 0.0])  # outside the x slab
        d = _r([0.0, 0.0, 1.0])
        hit, _, _ = intersect.closest_hit(o, d, scene)
        assert not bool(hit[0])

    def test_occlusion_strict_at_limit(self):
        # Blocker entered at exactly t = 4; occluded iff t < limit
        # STRICTLY: limit == 4 -> not occluded, limit slightly above ->
        # occluded.
        aabbs = Aabbs.build([[0.0, 0.0, 5.0]], [[1.0, 1.0, 1.0]])
        scene = Scene.build(None, aabbs, None, None)
        o = _r([0.0, 0.0, 0.0])
        d = _r([0.0, 0.0, 1.0])
        occ_at = intersect.any_hit_within(o, d, jnp.asarray([4.0]), scene)
        occ_past = intersect.any_hit_within(o, d, jnp.asarray([4.0001]),
                                            scene)
        assert not bool(occ_at[0])
        assert bool(occ_past[0])
