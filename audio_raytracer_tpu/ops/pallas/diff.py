"""Differentiable bridge for the Pallas kernels.

Pallas calls have no automatic AD rules, so the differentiable tier wires
the TPU kernels into JAX autodiff explicitly:

- ``chord_loss``: jax.custom_vjp pairing chord_loss_kernel (forward) with
  chord_bwd_kernel (backward) — gradients to ray origin/direction (source
  and listener poses) and to per-primitive material density, all at O(R+P)
  memory (the jnp tier's [R, P] grids OOM at the 1M x 4K headline).
- Closest-hit distances are differentiated by the winner-recompute trick
  instead (ops.intersect.primitive_t_per_ray): the kernel supplies the
  argmin selection, an O(R) jnp recompute supplies the derivative. That
  lives in ops.pallas.backend.PallasBackend(differentiable=True).
- Occlusion/visibility booleans carry no tangents by construction
  (straight-through, matching models.differentiable's convention).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audio_raytracer_tpu.ops.pallas import kernels as K


def _zero_cotangent(v):
    if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating):
        return jnp.zeros_like(v)
    return np.zeros(jnp.shape(v), jax.dtypes.float0)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def chord_loss(counts, interpret, prim_fields, o, d, skip):
    """Differentiable per-ray permeation loss (sum of chord x density).

    counts/interpret are static; prim_fields is the PallasBackend field
    dict (gradients flow to its ``*_dens`` entries), o/d are [R, 3].
    """
    return K.run_chord_loss(prim_fields, counts, o, d, skip,
                            interpret=interpret)


def _chord_fwd(counts, interpret, prim_fields, o, d, skip):
    loss = K.run_chord_loss(prim_fields, counts, o, d, skip,
                            interpret=interpret)
    return loss, (prim_fields, o, d, skip)


def _chord_bwd(counts, interpret, res, g):
    prim_fields, o, d, skip = res
    d_o, d_d, dens_grads = K.run_chord_loss_bwd(
        prim_fields, counts, o.astype(jnp.float32), d.astype(jnp.float32),
        skip, g.astype(jnp.float32), interpret=interpret)
    field_cts = {}
    for k, v in prim_fields.items():
        if k in dens_grads:
            field_cts[k] = dens_grads[k].reshape(v.shape).astype(v.dtype)
        else:
            field_cts[k] = _zero_cotangent(v)
    return (field_cts, d_o.astype(o.dtype), d_d.astype(d.dtype),
            _zero_cotangent(skip))


chord_loss.defvjp(_chord_fwd, _chord_bwd)
