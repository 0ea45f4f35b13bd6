"""Fibonacci-sphere ray direction generation.

Reference: Jobs/FibonacciDirectionsJobParallel.cs:25-34 — golden-angle
spiral: phi = pi*(3 - sqrt(5)), y_i = 1 - 2*i/(n-1), r = sqrt(1 - y^2),
theta = phi*i, dir = (cos(theta)*r, y, sin(theta)*r). The reference stores
half3; we keep f32 canonical with an optional storage dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def fibonacci_directions(count: int, dtype=jnp.float32) -> Array:
    """[count, 3] unit-ish directions on the sphere (golden-angle spiral).

    Matches the reference exactly, including the n-1 denominator (so the
    first and last directions sit at the poles, |y| = 1, radius 0).
    """
    i = jnp.arange(count, dtype=jnp.float32)
    phi = jnp.pi * (3.0 - jnp.sqrt(5.0))
    y = 1.0 - (i / jnp.float32(count - 1)) * 2.0
    radius = jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0))
    theta = phi * i
    x = jnp.cos(theta) * radius
    z = jnp.sin(theta) * radius
    return jnp.stack([x, y, z], axis=-1).astype(dtype)
