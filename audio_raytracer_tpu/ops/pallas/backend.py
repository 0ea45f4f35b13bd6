"""PallasBackend: the TPU-kernel intersection engine.

Drop-in replacement for ops.backend.DenseBackend behind the same
protocol, backed by the streaming rays x prims kernels in
ops.pallas.kernels. Field preparation (padding to sublane chunks,
min/max precompute, miss encodings) happens at trace time inside jit —
it is O(P) and fuses away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_raytracer_tpu.ops import intersect
from audio_raytracer_tpu.ops.pallas import kernels as K
from audio_raytracer_tpu.types import Scene

Array = jnp.ndarray

NO_SKIP = -(2**31)  # "skip nothing" sentinel; real target ids are >= 0
_ATTR_KEYS = ("kind", "center", "half_extents", "inv_rot", "absorption", "echo")


def _pad_field(x, n_pad, fill):
    if n_pad == 0:
        return x
    return jnp.concatenate([x, jnp.full((n_pad,), fill, x.dtype)])


class PallasBackend:
    """All primitives visible locally, intersections on the Pallas tier.

    ``interpret=True`` runs the kernels in the Pallas interpreter
    (CPU-testable parity path).
    """

    def __init__(self, scene: Scene, interpret: bool = False):
        self.scene = scene
        self.interpret = interpret

        sp, ab, ob = scene.spheres, scene.aabbs, scene.obbs
        ns, na, no = sp.count, ab.count, ob.count
        ns8, na8, no8 = K._pad8(ns), K._pad8(na), K._pad8(no)
        if ns == 0:
            ns8 = 0
        if na == 0:
            na8 = 0
        if no == 0:
            no8 = 0
        self.counts = (ns8, na8, no8)
        self.total_padded = ns8 + na8 + no8

        f32 = jnp.float32

        def col(x, n_pad, fill=0.0, dtype=f32):
            return _pad_field(jnp.asarray(x, dtype), n_pad, fill
                              ).reshape(-1, 1)

        fields = {}
        if ns8:
            pad = ns8 - ns
            r2 = jnp.where(sp.active, sp.radius * sp.radius, -1e30)
            fields.update(
                s_cx=col(sp.center[:, 0], pad),
                s_cy=col(sp.center[:, 1], pad),
                s_cz=col(sp.center[:, 2], pad),
                s_r2=col(r2, pad, fill=-1e30),
                s_tgt=col(sp.target_id, pad, fill=-9, dtype=jnp.int32),
                s_dens=col(sp.material.density, pad),
            )
        if na8:
            pad = na8 - na
            fields.update(
                a_minx=col(ab.center[:, 0] - ab.half_extents[:, 0], pad),
                a_miny=col(ab.center[:, 1] - ab.half_extents[:, 1], pad),
                a_minz=col(ab.center[:, 2] - ab.half_extents[:, 2], pad),
                a_maxx=col(ab.center[:, 0] + ab.half_extents[:, 0], pad),
                a_maxy=col(ab.center[:, 1] + ab.half_extents[:, 1], pad),
                a_maxz=col(ab.center[:, 2] + ab.half_extents[:, 2], pad),
                a_miss=col(jnp.where(ab.active, 0.0, jnp.inf), pad,
                           fill=jnp.inf),
                a_tgt=col(ab.target_id, pad, fill=-9, dtype=jnp.int32),
                a_dens=col(ab.material.density, pad),
            )
        if no8:
            pad = no8 - no
            fields.update(
                o_cx=col(ob.center[:, 0], pad),
                o_cy=col(ob.center[:, 1], pad),
                o_cz=col(ob.center[:, 2], pad),
                o_hx=col(ob.half_extents[:, 0], pad),
                o_hy=col(ob.half_extents[:, 1], pad),
                o_hz=col(ob.half_extents[:, 2], pad),
                o_qx=col(ob.inv_rot[:, 0], pad),
                o_qy=col(ob.inv_rot[:, 1], pad),
                o_qz=col(ob.inv_rot[:, 2], pad),
                o_qw=col(ob.inv_rot[:, 3], pad, fill=1.0),
                o_miss=col(jnp.where(ob.active, 0.0, jnp.inf), pad,
                           fill=jnp.inf),
                o_tgt=col(ob.target_id, pad, fill=-9, dtype=jnp.int32),
                o_dens=col(ob.material.density, pad),
            )
        self._fields = fields

        geom = [k for k in fields
                if not k.endswith("_tgt") and not k.endswith("_dens")]
        self._closest_fields = {k: fields[k] for k in geom}
        self._anyhit_fields = {k: fields[k] for k in fields
                               if not k.endswith("_dens")}
        self._chord_fields = fields

        # Padded unified attribute arrays (rank order [sphere, aabb, obb],
        # padded counts) for winner gathers.
        if self.total_padded:
            self._uni = self._build_uni(sp, ab, ob, ns8, na8, no8)
        else:
            self._uni = None

    @staticmethod
    def _build_uni(sp, ab, ob, ns8, na8, no8):
        f32 = jnp.float32

        def padv(x, n, fill=0.0):
            x = jnp.asarray(x, f32)
            pad = n - x.shape[0]
            if pad == 0:
                return x
            shape = (pad,) + x.shape[1:]
            return jnp.concatenate([x, jnp.full(shape, fill, f32)])

        kind = jnp.concatenate([
            jnp.zeros((ns8,), jnp.int32),
            jnp.ones((na8,), jnp.int32),
            jnp.full((no8,), 2, jnp.int32),
        ]) if (ns8 + na8 + no8) else jnp.zeros((0,), jnp.int32)
        center = jnp.concatenate([
            padv(sp.center, ns8), padv(ab.center, na8), padv(ob.center, no8)])
        half = jnp.concatenate([
            padv(jnp.broadcast_to(jnp.asarray(sp.radius, f32)[:, None],
                                  (sp.count, 3)), ns8),
            padv(ab.half_extents, na8), padv(ob.half_extents, no8)])
        idq = jnp.asarray([0.0, 0.0, 0.0, 1.0], f32)
        inv_rot = jnp.concatenate([
            jnp.broadcast_to(idq, (ns8 + na8, 4)),
            padv(ob.inv_rot, no8, fill=0.0)])
        absorption = jnp.concatenate([
            padv(sp.material.absorption, ns8),
            padv(ab.material.absorption, na8),
            padv(ob.material.absorption, no8)])
        echo = jnp.concatenate([
            padv(sp.material.echo, ns8), padv(ab.material.echo, na8),
            padv(ob.material.echo, no8)])
        return dict(kind=kind, center=center, half_extents=half,
                    inv_rot=inv_rot, absorption=absorption, echo=echo)

    # -- Backend protocol ---------------------------------------------------

    def closest_hit(self, o: Array, d: Array):
        if self.total_padded == 0:
            z3 = jnp.zeros(o.shape, o.dtype)
            t = jnp.full(o.shape[:-1], jnp.inf, o.dtype)
            attrs = dict(kind=jnp.zeros(t.shape, jnp.int32), center=z3,
                         half_extents=z3,
                         inv_rot=jnp.zeros(o.shape[:-1] + (4,), o.dtype),
                         absorption=jnp.zeros_like(t),
                         echo=jnp.zeros_like(t))
            return jnp.zeros(t.shape, bool), t, attrs
        t, rank = K.run_closest_hit(self._closest_fields, self.counts,
                                    o.astype(jnp.float32),
                                    d.astype(jnp.float32),
                                    interpret=self.interpret)
        idx = jnp.minimum(rank, self.total_padded - 1)
        attrs = {k: self._uni[k][idx] for k in _ATTR_KEYS}
        return jnp.isfinite(t), t, attrs

    def closest_t(self, o: Array, d: Array) -> Array:
        if self.total_padded == 0:
            return jnp.full(o.shape[:-1], jnp.inf, o.dtype)
        t, _ = K.run_closest_hit(self._closest_fields, self.counts,
                                 o.astype(jnp.float32),
                                 d.astype(jnp.float32),
                                 interpret=self.interpret)
        return t

    def occluded(self, o, d, limit, skip_target_id=None) -> Array:
        if self.total_padded == 0:
            return jnp.zeros(o.shape[:-1], bool)
        skip = NO_SKIP if skip_target_id is None else skip_target_id
        return K.run_any_hit(self._anyhit_fields, self.counts,
                             o.astype(jnp.float32), d.astype(jnp.float32),
                             jnp.asarray(limit, jnp.float32), skip,
                             interpret=self.interpret)

    def permeation_loss(self, o, d, skip_target_id) -> Array:
        if self.total_padded == 0:
            return jnp.zeros(o.shape[:-1], o.dtype)
        skip = NO_SKIP if skip_target_id is None else skip_target_id
        return K.run_chord_loss(self._chord_fields, self.counts,
                                o.astype(jnp.float32),
                                d.astype(jnp.float32), skip,
                                interpret=self.interpret)
