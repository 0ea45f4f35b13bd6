"""Reduced-precision (bfloat16) kernel tier: statistical parity vs f32.

The bf16 tier (TraceConfig.compute_dtype="bfloat16") runs the Pallas
kernels' geometry arithmetic in bf16 with f32 islands for cmp / select /
sqrt / div (ops/pallas/kernels.py module docstring). It is the analog of
the reference's half-precision collider storage
(DataTypes/Collider Structs/ColliderAABBStruct.cs:10-11,
DataTypes/halfQuaternion.cs) — a ~8-bit-mantissa tier whose outputs are
statistically, not bitwise, close to f32. These tests pin the documented
tolerances on a compact scene (world scale ~20 m, where bf16 position
resolution is ~0.1 m):

- closest-hit: hit/miss agreement >= 95%, median rel t error < 1%
- occlusion flags: >= 98% agreement
- chord (permeation) sums: median rel error < 5% on hit rays
- end-to-end muffle counts within 25% (boolean visibility flips compound
  over bounces; the tier is documented as unsuitable for large scenes)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_raytracer_tpu.models.raytracer import forward, random_scene
from audio_raytracer_tpu.ops.backend import NO_SKIP, DenseBackend
from audio_raytracer_tpu.ops.fibonacci import fibonacci_directions
from audio_raytracer_tpu.ops.pallas import PallasBackend
from audio_raytracer_tpu.types import TraceConfig

R = 4096
P = 64


@pytest.fixture(scope="module")
def scene():
    return random_scene(jax.random.key(7), num_spheres=P // 4,
                        num_aabbs=P // 2, num_obbs=P // 4, num_targets=2,
                        extent=20.0, size_range=(0.5, 4.0))


@pytest.fixture(scope="module")
def rays():
    o = jnp.zeros((R, 3)) + jnp.array([0.3, 0.1, 0.2])
    return o, fibonacci_directions(R)


def test_bf16_closest_hit_statistics(scene, rays):
    o, d = rays
    be = PallasBackend(scene, interpret=True, compute_dtype=jnp.bfloat16)
    t16, _ = be.local_closest(o, d)
    _, tf, _ = DenseBackend(scene).closest_hit(o, d)
    t16, tf = np.asarray(t16), np.asarray(tf)
    agree = (np.isfinite(t16) == np.isfinite(tf)).mean()
    assert agree >= 0.95, agree
    m = np.isfinite(t16) & np.isfinite(tf)
    rel = np.abs(t16[m] - tf[m]) / np.abs(tf[m])
    assert np.median(rel) < 0.01, np.median(rel)


def test_bf16_occlusion_statistics(scene, rays):
    o, d = rays
    be = PallasBackend(scene, interpret=True, compute_dtype=jnp.bfloat16)
    dense = DenseBackend(scene)
    dirs = [d, -d]
    limits = jnp.full((R, 2), 10.0)
    init = jnp.zeros((R, 2), bool)
    occ16 = np.asarray(be.multi_occluded(o, dirs, limits, (NO_SKIP, 0),
                                         init))
    occf = np.asarray(dense.multi_occluded(o, dirs, limits, (NO_SKIP, 0),
                                           init))
    assert (occ16 == occf).mean() >= 0.98


def test_bf16_chord_statistics(scene, rays):
    o, d = rays
    be = PallasBackend(scene, interpret=True, compute_dtype=jnp.bfloat16)
    dense = DenseBackend(scene)
    dirs = [d, -d]
    c16 = np.asarray(be.multi_permeation_loss(o, dirs, (0, 1)))
    cf = np.asarray(dense.multi_permeation_loss(o, dirs, (0, 1)))
    m = cf > 0.1
    assert m.any()
    rel = np.abs(c16[m] - cf[m]) / cf[m]
    assert np.median(rel) < 0.05, np.median(rel)
    # Total permeation energy within 5%.
    assert abs(c16.sum() - cf.sum()) / cf.sum() < 0.05


def test_bf16_forward_end_to_end(scene, rays):
    """Both tiers run with epsilon >= the bf16 position resolution at
    this world scale (~20 m * 2^-8 ~ 0.08) so the hit-point offset
    survives rounding — the documented requirement for the bf16 tier
    (ops/pallas/kernels.py module docstring). Differences then isolate
    to arithmetic precision."""
    _, d = rays
    origin = jnp.array([0.3, 0.1, 0.2])
    out = {}
    for dt in ("float32", "bfloat16"):
        cfg = TraceConfig(ray_count=R, max_bounces=2, max_ray_life=60.0,
                          max_muffle_hit_distance=50.0, compute_dtype=dt,
                          epsilon=0.25)
        res, settings = forward(origin, d, scene, cfg,
                                backend="pallas_interpret")
        out[dt] = (jax.tree.map(np.asarray, res),
                   jax.tree.map(np.asarray, settings))
    rf, sf = out["float32"]
    rb, sb = out["bfloat16"]
    mf, mb = rf.muffle_hits.sum(0), rb.muffle_hits.sum(0)
    assert (np.abs(mb - mf) <= np.maximum(0.25 * mf, 25)).all(), (mf, mb)
    pf, pb = rf.permeation.sum(0), rb.permeation.sum(0)
    np.testing.assert_allclose(pb, pf, rtol=0.05, atol=1.0)
    ef, eb = rf.echo_distances.sum(), rb.echo_distances.sum()
    assert abs(eb - ef) / max(abs(ef), 1e-6) < 0.25


def test_f32_tier_unchanged_by_dtype_plumbing(scene, rays):
    """compute_dtype='float32' must be bit-identical to the pre-knob
    kernels: the _f32/_neg islands are identity on f32."""
    o, d = rays
    be = PallasBackend(scene, interpret=True, compute_dtype=jnp.float32)
    t1, r1 = be.local_closest(o, d)
    be2 = PallasBackend(scene, interpret=True)
    t2, r2 = be2.local_closest(o, d)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
