"""Reverb impulse-response time binning (BASELINE config 3).

Oracle parity (numpy linear splatting), energy conservation, gradient
flow to material echo, and ray-shard invariance of the histogram.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_raytracer_tpu.models.differentiable import (
    Loudness,
    SceneParams,
    loudness_loss,
    loudness_map,
)
from audio_raytracer_tpu.models.raytracer import forward, random_scene
from audio_raytracer_tpu.ops import reverb
from audio_raytracer_tpu.ops.fibonacci import fibonacci_directions
from audio_raytracer_tpu.types import TraceConfig


def _np_ir(dist, w, n, max_dist):
    """Numpy oracle: linear splatting histogram."""
    dist = np.asarray(dist, np.float64).ravel()
    w = np.asarray(w, np.float64).ravel()
    out = np.zeros(n)
    for x, ww in zip(dist, w):
        if x <= 0.0:
            continue
        b = min(max(x * n / max_dist, 0.0), n - 1.0)
        i0 = int(np.floor(b))
        f = b - i0
        out[i0] += ww * (1 - f)
        out[min(i0 + 1, n - 1)] += ww * f
    return out


@pytest.fixture(scope="module")
def cfg():
    return TraceConfig(ray_count=64, max_bounces=3, max_ray_life=150.0,
                       num_reverb_bins=16, ir_max_distance=100.0)


@pytest.fixture(scope="module")
def scene():
    return random_scene(jax.random.key(11), num_spheres=6, num_aabbs=10,
                        num_obbs=8, num_targets=2, extent=14.0,
                        size_range=(1.0, 4.0))


class TestHistogram:
    def test_matches_numpy_oracle(self, cfg, rng):
        dist = jnp.asarray(rng.uniform(0, 130, size=(40, 4)), jnp.float32)
        dist = dist * (rng.random((40, 4)) > 0.3)  # some zero slots
        w = jnp.asarray(rng.random((40, 4)), jnp.float32)
        ir = reverb.impulse_response(dist, cfg, weights=w)
        ref = _np_ir(dist, w, cfg.num_reverb_bins, cfg.ir_max_distance)
        np.testing.assert_allclose(np.asarray(ir), ref, rtol=1e-4, atol=1e-4)

    def test_energy_conserved(self, cfg, rng):
        dist = jnp.asarray(rng.uniform(1, 500, size=(30,)), jnp.float32)
        ir = reverb.impulse_response(dist, cfg)
        # All 30 echoes (incl. out-of-window, folded into the last bin).
        np.testing.assert_allclose(float(jnp.sum(ir)), 30.0, rtol=1e-5)

    def test_zero_entries_carry_no_energy(self, cfg):
        ir = reverb.impulse_response(jnp.zeros((8, 4)), cfg)
        np.testing.assert_allclose(np.asarray(ir), 0.0)

    def test_distance_gradient(self, cfg):
        """The histogram is piecewise-linear in distances: d IR[b]/d dist
        must match the splatting slope away from bin edges."""
        d0 = 12.3
        width = cfg.ir_max_distance / cfg.num_reverb_bins

        def f(x):
            ir = reverb.impulse_response(x[None], cfg)
            return ir[int(d0 // width) + 1]  # weight flowing into i1

        g = jax.grad(f)(jnp.asarray([d0], jnp.float32))
        np.testing.assert_allclose(float(g[0]), 1.0 / width, rtol=1e-5)


class TestForwardIntegration:
    def test_forward_populates_ir(self, cfg, scene):
        origin = jnp.zeros(3)
        dirs = fibonacci_directions(cfg.ray_count)
        result, _ = forward(origin, dirs, scene, cfg)
        assert result.reverb_ir is not None
        assert result.reverb_ir.shape == (cfg.num_reverb_bins,)
        direct = reverb.impulse_response(result.echo_distances, cfg)
        np.testing.assert_allclose(np.asarray(result.reverb_ir),
                                   np.asarray(direct), rtol=1e-6)
        # Total energy == number of echo events.
        n_echo = float(jnp.sum(result.echo_distances > 0))
        np.testing.assert_allclose(float(jnp.sum(result.reverb_ir)), n_echo,
                                   rtol=1e-5)

    def test_disabled_by_default(self, scene):
        cfg0 = TraceConfig(ray_count=32, max_bounces=2)
        origin = jnp.zeros(3)
        result, _ = forward(origin, fibonacci_directions(32), scene, cfg0)
        assert result.reverb_ir is None


class TestDifferentiableIR:
    def test_loudness_map_ir_and_echo_grad(self, cfg, scene):
        origin = jnp.zeros(3)
        dirs = fibonacci_directions(cfg.ray_count)
        pred = loudness_map(origin, dirs, scene, cfg)
        assert pred.reverb_ir is not None
        assert float(jnp.sum(pred.reverb_ir)) > 0.0

        params = SceneParams.from_scene(scene)
        target = Loudness(muffle=jnp.full((2,), 0.3),
                          permeation=jnp.full((2,), 0.2),
                          reverb_energy=jnp.asarray(0.05),
                          reverb_ir=jnp.zeros((cfg.num_reverb_bins,)))

        def f(echo_a):
            p = dataclasses.replace(
                params, aabb=dataclasses.replace(params.aabb, echo=echo_a))
            return loudness_loss(p, scene, origin, dirs, cfg, target)

        echo = params.aabb.echo
        g = jax.grad(f)(echo)
        assert float(jnp.sum(jnp.abs(g))) > 0.0
        # FD check on the largest-gradient entry (the IR term is
        # piecewise-linear in echo through the bin positions).
        i = int(np.argmax(np.abs(np.asarray(g))))
        eps = 1e-3
        e = jnp.zeros_like(echo).at[i].set(eps)
        fd = (f(echo + e) - f(echo - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=5e-2,
                                   atol=1e-7)


class TestShardInvariance:
    def test_ray_sharded_ir_matches_dense(self, scene):
        from audio_raytracer_tpu.parallel.mesh import make_mesh
        from audio_raytracer_tpu.parallel.sharded import make_sharded_forward

        cfg = TraceConfig(ray_count=64, max_bounces=2, max_ray_life=150.0,
                          num_reverb_bins=12, ir_max_distance=80.0,
                          num_accum_batches=4)
        origin = jnp.zeros(3)
        dirs = fibonacci_directions(cfg.ray_count)
        r_dense, _ = forward(origin, dirs, scene, cfg)

        mesh = make_mesh(ray_shards=4, prim_shards=1,
                         devices=jax.devices()[:4])
        step = make_sharded_forward(cfg, mesh, return_result=True)
        r_shard, _ = step(origin, dirs, scene)
        np.testing.assert_allclose(np.asarray(r_shard.reverb_ir),
                                   np.asarray(r_dense.reverb_ir),
                                   rtol=1e-5, atol=1e-5)
