"""Sampled animation curves: piecewise-linear LUTs.

Replaces DataTypes/NativeSampledAnimationCurve.cs — the reference bakes a
Unity AnimationCurve into N uniform samples and evaluates with a clamped
lerp lookup (cs:64-88). Here a curve IS its samples (a pytree leaf), so
curves are differentiable and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from audio_raytracer_tpu.tree import pytree_dataclass

Array = jnp.ndarray


@pytree_dataclass
class SampledCurve:
    """Uniformly sampled curve over [0, length]."""

    samples: Array  # [K]
    length: Array  # scalar; time of the last key

    def evaluate(self, time: Array) -> Array:
        """Clamped piecewise-linear lookup, replicating
        NativeSampledAnimationCurve.EvaluateWithBurst exactly: percent =
        time / length, index = clamp(percent * (K-1), 0, K-1),
        lerp(floor, ceil)."""
        k = self.samples.shape[0]
        pct = time / self.length
        idx = jnp.clip(pct * (k - 1), 0.0, float(k - 1))
        lo = jnp.floor(idx).astype(jnp.int32)
        hi = jnp.ceil(idx).astype(jnp.int32)
        frac = idx - lo
        return self.samples[lo] * (1.0 - frac) + self.samples[hi] * frac

    @staticmethod
    def linear(k: int = 50, value_multiplier: float = 1.0) -> "SampledCurve":
        """The reference's Default: identity ramp 0..1
        (AnimationCurve.Linear keys sorted to (0,0)->(1,1), 50 samples)."""
        t = jnp.linspace(0.0, 1.0, k)
        return SampledCurve(samples=t * value_multiplier,
                            length=jnp.asarray(1.0))

    @staticmethod
    def from_fn(fn, k: int = 50, length: float = 1.0,
                value_multiplier: float = 1.0) -> "SampledCurve":
        t = jnp.linspace(0.0, length, k)
        return SampledCurve(samples=fn(t) * value_multiplier,
                            length=jnp.asarray(length))
