"""Reduce raw trace outputs to per-target audio settings.

Reference: Jobs/ProcessAudioDataJob.cs. Replicated quirks:

- Reverb stats count ZERO echo entries as "returned hits" (cs:42-45):
  ``reverbVolume`` is really the fraction of (ray, bounce-slot) entries
  that are zero — unused slots and missed rays included.
- ``avgReverbDist`` divides by rayCount * maxHitsPerRay regardless of how
  many entries are nonzero (cs:49).
- Muffle: 1 - hits / (rayCount * maxHitsPerRay) * effectiveness, then the
  permeation term is subtracted BEFORE saturation (cs:68-71).
- All outputs saturate to [0, 1] in the settings constructor
  (DataTypes/AudioTargetRTSettings.cs:19-24).
"""

from __future__ import annotations

import jax.numpy as jnp

from audio_raytracer_tpu.types import Scene, TargetSettings, TraceConfig, TraceResult

Array = jnp.ndarray


def _saturate(x: Array) -> Array:
    return jnp.clip(x, 0.0, 1.0)


def process(result: TraceResult, scene: Scene, cfg: TraceConfig) -> TargetSettings:
    echo = result.echo_distances  # [R, H]
    R, H = echo.shape
    max_ray_hits = R * H

    # Reverb statistics (listener-global).
    zero_entries = jnp.sum(echo == 0.0)
    reverb_total = jnp.sum(echo)
    avg_reverb_dist = reverb_total / max_ray_hits
    reverb_strength = avg_reverb_dist / cfg.max_reverb_distance
    reverb_volume = zero_entries.astype(echo.dtype) / max_ray_hits

    # Per-target muffle from per-batch accumulators (cs:55-75).
    total_hits = jnp.sum(result.muffle_hits, axis=0).astype(echo.dtype)  # [T]
    total_perm = jnp.sum(result.permeation, axis=0)  # [T]

    muffle = 1.0 - total_hits / (R * H) * cfg.muffle_effectiveness
    perm_term = (total_perm / R / cfg.permeation_strength_per_ray
                 * cfg.permeation_effectiveness)
    muffle = _saturate(muffle - perm_term)

    return TargetSettings(
        muffle=_saturate(muffle),
        reverb_strength=_saturate(reverb_strength),
        reverb_volume=_saturate(reverb_volume),
        perceived_position=scene.target_positions,
    )
