"""Reverb impulse-response accumulation into time bins (BASELINE config 3).

The reference records per-(ray, bounce) echo distances
(Jobs/AudioRaytracerJobBatched.cs:121-147) and collapses them to three
scalar reverb stats (Jobs/ProcessAudioDataJob.cs:38-52). This module
generalizes that recording into a differentiable energy histogram over
arrival-time bins — the impulse response of the room as seen by the
listener:

    delay(ray, k) = echo_distance(ray, k) / speed_of_sound
    IR[b] = sum of echo energy whose delay falls in time bin b

Binning is *linear splatting* (triangular kernel): each echo contributes
to its two neighbouring bins weighted by the fractional bin position, so
the histogram is piecewise-linear — and therefore differentiable — in the
echo distances (and exactly linear in the energy weights). Delays beyond
the IR window accumulate into the last bin (energy is conserved, nothing
silently dropped).

Zero entries in ``echo_distances`` mean "no unoccluded echo for this
(ray, bounce) slot" and carry no energy here. (ProcessAudioDataJob.cs:42-45
deliberately counts those zeros as returned hits in its scalar
reverb_volume stat — that quirk lives in ops/process.py; an impulse
response must not inject energy at t=0 for them.)

The per-shard histogram is a plain sum over rays, so under ray sharding
it psum-reduces exactly like the muffle/permeation accumulators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_raytracer_tpu.types import TraceConfig

Array = jnp.ndarray

SPEED_OF_SOUND = 343.0  # m/s at 20C


def bin_times(cfg: TraceConfig) -> Array:
    """[n_bins] left edge of each IR time bin, in seconds."""
    width = cfg.ir_max_distance / SPEED_OF_SOUND / cfg.num_reverb_bins
    return jnp.arange(cfg.num_reverb_bins, dtype=jnp.float32) * width


def impulse_response(echo_distances: Array, cfg: TraceConfig,
                     weights: Array | None = None,
                     axis_name: str | None = None) -> Array:
    """[n_bins] energy histogram over arrival-time bins.

    echo_distances: [..., H] per-(ray, hit-slot) echo distances
    (distance x material.Echo, 0 = no echo). ``weights``: optional
    matching energy weights (e.g. the differentiable per-bounce ray
    energy of models.differentiable); default 1 per echo. With
    ``axis_name``, the histogram is psum-reduced over that mesh axis.
    """
    n = cfg.num_reverb_bins
    assert n > 0, "set TraceConfig.num_reverb_bins > 0 for IR accumulation"
    dist = echo_distances.reshape(-1)
    has_echo = dist > 0.0
    w = (jnp.ones_like(dist) if weights is None
         else weights.reshape(-1).astype(dist.dtype))
    w = jnp.where(has_echo, w, 0.0)

    # Fractional bin position; out-of-window energy lands in the last bin.
    bin_f = dist * (n / cfg.ir_max_distance)
    bin_f = jnp.clip(bin_f, 0.0, n - 1.0)
    i0 = jnp.floor(bin_f)
    frac = bin_f - i0  # gradient d frac / d dist flows through bin_f
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)

    ir = jnp.zeros((n,), dist.dtype)
    ir = ir.at[i0].add(w * (1.0 - frac))
    ir = ir.at[i1].add(w * frac)
    if axis_name is not None:
        ir = jax.lax.psum(ir, axis_name)
    return ir
