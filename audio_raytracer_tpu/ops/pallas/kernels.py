"""Pallas TPU kernels for the rays x primitives hot loops.

Replaces the Burst SIMD tier of the reference
(Jobs/AudioRaytracerJobBatched.cs:225-449, AudioPermeationJobBatched.cs)
with VPU kernels shaped for the TPU register file:

- Rays are packed (R/RAY_COLS, RAY_COLS) — a plain reshape, ray r at
  [r // RAY_COLS, r % RAY_COLS] — so every HBM and VMEM tile is fully
  dense and the 1-D -> 2-D relayout is a cheap retiling that XLA fuses
  into the producing elementwise op (an earlier transposed packing cost
  ~88 ms per 4 MB strided copy at the 1M-ray scale). Each grid step
  stages an (8, RAY_COLS) block: RAY_BLOCK = 8 * RAY_COLS rays whose
  fields live as full (8, RAY_COLS) vregs.
- Primitives live in SMEM as 1-D scalar arrays and stream through the
  scalar unit one at a time: each loop iteration broadcasts one
  primitive's fields against the whole ray block, so every VPU op covers
  RAY_BLOCK (ray, prim) pairs. The scalar loads/loop bookkeeping run on
  the scalar core concurrently with the vector ops (decoupled
  access-execute), and no [R, P] grid ever materializes in HBM — the
  jnp tier OOMs at the 1M x 4K headline; this tier streams.
- The sequential primitive loop reproduces the reference's scan order
  (spheres, then AABBs, then OBBs, strict ``<`` update — earlier index
  wins ties) *exactly*, because it IS a sequential scan.
- Inactive padding encodes guaranteed misses (negative squared radius
  for spheres, a +inf ``miss`` add for boxes).

SMEM capacity bounds the primitive count per kernel call (~512 KB ->
~16K mixed primitives with every field resident); the PallasBackend
asserts the bound. Rays are unbounded (blocked over the grid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_COLS = 512
ROWS = 8
RAY_BLOCK = ROWS * RAY_COLS  # rays per grid step
# Python literals (not jnp constants): the kernel must not capture arrays.
INT_MAX = 2**31 - 1
BIG = 3.0e38
# SMEM budget for primitive fields (conservative; probe showed >= 512 KB).
SMEM_BYTES = 512 * 1024


def _safe_dir(d):
    # Zero-axis nudge, mirroring ops/intersect._aabb_slab.
    return jnp.where(jnp.abs(d) < 1e-12,
                     jnp.where(d >= 0, jnp.float32(1e-12),
                               jnp.float32(-1e-12)), d)


# ---------------------------------------------------------------------------
# Per-primitive tests (one scalar primitive vs an (8, RAY_COLS) ray block)
# ---------------------------------------------------------------------------


def _sphere_t(refs, p, ox, oy, oz, dx, dy, dz, a2, inv2a):
    """Sphere p hit distance over the ray block; BIG = miss.

    Full quadratic with a = dot(d, d), near root preferred
    (AudioRaytracerJobBatched.cs:323-355). a2 = 2a, inv2a = 1/(2a).
    """
    cx, cy, cz = refs["s_cx"][p], refs["s_cy"][p], refs["s_cz"][p]
    r2 = refs["s_r2"][p]
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
    disc = b * b - a2 * 2.0 * cc
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.where(hit, disc, 1.0))
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    t = jnp.where(t0 >= 0.0, t0, jnp.where(t1 >= 0.0, t1, BIG))
    return jnp.where(hit, t, BIG)


def _slab_t(minx, miny, minz, maxx, maxy, maxz, ox, oy, oz, ix, iy, iz):
    """Slab test (scalar bounds vs ray-block vectors). Returns
    (t, t_near, t_far, miss): t per reference select (tNear if > 0 else
    tFar), miss when tNear > tFar or tFar < 0."""
    t0x, t1x = (minx - ox) * ix, (maxx - ox) * ix
    t0y, t1y = (miny - oy) * iy, (maxy - oy) * iy
    t0z, t1z = (minz - oz) * iz, (maxz - oz) * iz
    tnx, tfx = jnp.minimum(t0x, t1x), jnp.maximum(t0x, t1x)
    tny, tfy = jnp.minimum(t0y, t1y), jnp.maximum(t0y, t1y)
    tnz, tfz = jnp.minimum(t0z, t1z), jnp.maximum(t0z, t1z)
    t_near = jnp.maximum(jnp.maximum(tnx, tny), tnz)
    t_far = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
    miss = (t_near > t_far) | (t_far < 0.0)
    t = jnp.where(t_near > 0.0, t_near, t_far)
    return t, t_near, t_far, miss


def _aabb_t(refs, p, ox, oy, oz, ix, iy, iz):
    t, _, _, miss = _slab_t(
        refs["a_minx"][p], refs["a_miny"][p], refs["a_minz"][p],
        refs["a_maxx"][p], refs["a_maxy"][p], refs["a_maxz"][p],
        ox, oy, oz, ix, iy, iz)
    return jnp.where(miss, BIG, t) + refs["a_miss"][p]


def _quat_rotate(qx, qy, qz, qw, vx, vy, vz):
    """Rotate block vectors by a scalar quaternion:
    v' = v + w*t + q x t with t = 2 q x v.
    """
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    rx = vx + qw * tx + (qy * tz - qz * ty)
    ry = vy + qw * ty + (qz * tx - qx * tz)
    rz = vz + qw * tz + (qx * ty - qy * tx)
    return rx, ry, rz


def _obb_local(refs, p, ox, oy, oz, dx, dy, dz):
    """Rotate the ray block into OBB p's local frame using the stored
    (pre-inverted) quaternion. Returns local origin and direction."""
    cx, cy, cz = refs["o_cx"][p], refs["o_cy"][p], refs["o_cz"][p]
    qx, qy, qz = refs["o_qx"][p], refs["o_qy"][p], refs["o_qz"][p]
    qw = refs["o_qw"][p]
    lox, loy, loz = _quat_rotate(qx, qy, qz, qw, ox - cx, oy - cy, oz - cz)
    ldx, ldy, ldz = _quat_rotate(qx, qy, qz, qw, dx, dy, dz)
    return lox, loy, loz, ldx, ldy, ldz


def _obb_t(refs, p, ox, oy, oz, dx, dy, dz):
    hx, hy, hz = refs["o_hx"][p], refs["o_hy"][p], refs["o_hz"][p]
    lox, loy, loz, ldx, ldy, ldz = _obb_local(refs, p, ox, oy, oz, dx, dy, dz)
    ldx, ldy, ldz = _safe_dir(ldx), _safe_dir(ldy), _safe_dir(ldz)
    ix, iy, iz = 1.0 / ldx, 1.0 / ldy, 1.0 / ldz
    t, _, _, miss = _slab_t(-hx, -hy, -hz, hx, hy, hz,
                            lox, loy, loz, ix, iy, iz)
    return jnp.where(miss, BIG, t) + refs["o_miss"][p]


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _ray_block_inputs(refs):
    ox, oy, oz = refs["ox"][...], refs["oy"][...], refs["oz"][...]
    dx, dy, dz = refs["dx"][...], refs["dy"][...], refs["dz"][...]
    sdx, sdy, sdz = _safe_dir(dx), _safe_dir(dy), _safe_dir(dz)
    ix, iy, iz = 1.0 / sdx, 1.0 / sdy, 1.0 / sdz
    a = dx * dx + dy * dy + dz * dz
    return ox, oy, oz, dx, dy, dz, ix, iy, iz, a


def closest_hit_kernel(counts, names, *refs_list):
    """Grid step: one ray block vs all primitives -> (t_min, winner rank).

    The fori loops below ARE the reference scan (sphere -> AABB -> OBB,
    strict < update: AudioRaytracerJobBatched.cs:225-280) vectorized over
    the ray block.
    """
    ns, na, no = counts
    refs = dict(zip(names, refs_list[:len(names)]))
    t_out, win_out = refs_list[len(names)], refs_list[len(names) + 1]

    ox, oy, oz, dx, dy, dz, ix, iy, iz, a = _ray_block_inputs(refs)
    a2 = 2.0 * a
    inv2a = 1.0 / a2
    shape = ox.shape

    best_t = jnp.full(shape, BIG, jnp.float32)
    best_i = jnp.full(shape, INT_MAX, jnp.int32)

    def update(best, t, rank):
        bt, bi = best
        upd = t < bt
        return jnp.where(upd, t, bt), jnp.where(upd, rank, bi)

    if ns:
        def s_body(p, best):
            return update(best,
                          _sphere_t(refs, p, ox, oy, oz, dx, dy, dz,
                                    a2, inv2a), p)
        best_t, best_i = jax.lax.fori_loop(0, ns, s_body, (best_t, best_i))
    if na:
        def a_body(p, best):
            return update(best, _aabb_t(refs, p, ox, oy, oz, ix, iy, iz),
                          ns + p)
        best_t, best_i = jax.lax.fori_loop(0, na, a_body, (best_t, best_i))
    if no:
        def o_body(p, best):
            return update(best, _obb_t(refs, p, ox, oy, oz, dx, dy, dz),
                          ns + na + p)
        best_t, best_i = jax.lax.fori_loop(0, no, o_body, (best_t, best_i))

    t_out[...] = best_t
    win_out[...] = best_i


def any_hit_kernel(counts, names, *refs_list):
    """Occlusion: any primitive with t < limit, skipping prims owned by
    the scalar ``skip`` target id (SMEM)."""
    ns, na, no = counts
    refs = dict(zip(names, refs_list[:len(names)]))
    skip_ref, occ_out = refs_list[len(names)], refs_list[len(names) + 1]
    skip = skip_ref[0]

    ox, oy, oz, dx, dy, dz, ix, iy, iz, a = _ray_block_inputs(refs)
    a2 = 2.0 * a
    inv2a = 1.0 / a2
    limit = refs["limit"][...]

    acc0 = jnp.zeros(ox.shape, jnp.int32)

    def hit_mask(t, tgt):
        return ((t < limit) & (tgt != skip)).astype(jnp.int32)

    acc = acc0
    if ns:
        def s_body(p, acc):
            t = _sphere_t(refs, p, ox, oy, oz, dx, dy, dz, a2, inv2a)
            return acc | hit_mask(t, refs["s_tgt"][p])
        acc = jax.lax.fori_loop(0, ns, s_body, acc)
    if na:
        def a_body(p, acc):
            t = _aabb_t(refs, p, ox, oy, oz, ix, iy, iz)
            return acc | hit_mask(t, refs["a_tgt"][p])
        acc = jax.lax.fori_loop(0, na, a_body, acc)
    if no:
        def o_body(p, acc):
            t = _obb_t(refs, p, ox, oy, oz, dx, dy, dz)
            return acc | hit_mask(t, refs["o_tgt"][p])
        acc = jax.lax.fori_loop(0, no, o_body, acc)

    occ_out[...] = acc


def _sphere_chord(refs, p, skip, ox, oy, oz, dx, dy, dz, dens):
    """Weighted chord through sphere p (half-b quadratic; direction
    assumed normalized — AudioPermeationJobBatched.cs:303-328)."""
    cx, cy, cz = refs["s_cx"][p], refs["s_cy"][p], refs["s_cz"][p]
    r2, tgt = refs["s_r2"][p], refs["s_tgt"][p]
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    b = ocx * dx + ocy * dy + ocz * dz
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
    disc = b * b - cc
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.where(hit, disc, 1.0))
    t_exit = -b + sq
    enter = jnp.maximum(-b - sq, 0.0)
    chord = jnp.maximum(0.0, t_exit - enter)
    valid = hit & (t_exit >= 0.0) & (tgt != skip)
    return jnp.where(valid, chord, 0.0) * dens


def _aabb_chord(refs, p, skip, ox, oy, oz, ix, iy, iz, dens):
    _, t_near, t_far, _ = _slab_t(
        refs["a_minx"][p], refs["a_miny"][p], refs["a_minz"][p],
        refs["a_maxx"][p], refs["a_maxy"][p], refs["a_maxz"][p],
        ox, oy, oz, ix, iy, iz)
    chord = jnp.maximum(0.0, t_far - jnp.maximum(t_near, 0.0))
    valid = ((t_near <= t_far) & (t_far >= 0.0)
             & (refs["a_tgt"][p] != skip) & (refs["a_miss"][p] == 0.0))
    return jnp.where(valid, chord, 0.0) * dens


def _obb_chord(refs, p, skip, ox, oy, oz, dx, dy, dz, dens):
    hx, hy, hz = refs["o_hx"][p], refs["o_hy"][p], refs["o_hz"][p]
    lox, loy, loz, ldx, ldy, ldz = _obb_local(refs, p, ox, oy, oz, dx, dy, dz)
    ldx, ldy, ldz = _safe_dir(ldx), _safe_dir(ldy), _safe_dir(ldz)
    _, t_near, t_far, _ = _slab_t(
        -hx, -hy, -hz, hx, hy, hz, lox, loy, loz,
        1.0 / ldx, 1.0 / ldy, 1.0 / ldz)
    chord = jnp.maximum(0.0, t_far - jnp.maximum(t_near, 0.0))
    valid = ((t_near <= t_far) & (t_far >= 0.0)
             & (refs["o_tgt"][p] != skip) & (refs["o_miss"][p] == 0.0))
    return jnp.where(valid, chord, 0.0) * dens


def chord_loss_kernel(counts, names, *refs_list):
    """Permeation: sum over primitives of chord-length x density
    (AudioPermeationJobBatched.cs:225-328), skipping the scalar target's
    own colliders."""
    ns, na, no = counts
    refs = dict(zip(names, refs_list[:len(names)]))
    skip_ref, loss_out = refs_list[len(names)], refs_list[len(names) + 1]
    skip = skip_ref[0]

    ox, oy, oz, dx, dy, dz, ix, iy, iz, _ = _ray_block_inputs(refs)
    acc = jnp.zeros(ox.shape, jnp.float32)

    if ns:
        def s_body(p, acc):
            return acc + _sphere_chord(refs, p, skip, ox, oy, oz, dx, dy, dz,
                                       refs["s_dens"][p])
        acc = jax.lax.fori_loop(0, ns, s_body, acc)
    if na:
        def a_body(p, acc):
            return acc + _aabb_chord(refs, p, skip, ox, oy, oz, ix, iy, iz,
                                     refs["a_dens"][p])
        acc = jax.lax.fori_loop(0, na, a_body, acc)
    if no:
        def o_body(p, acc):
            return acc + _obb_chord(refs, p, skip, ox, oy, oz, dx, dy, dz,
                                    refs["o_dens"][p])
        acc = jax.lax.fori_loop(0, no, o_body, acc)

    loss_out[...] = acc


# ---------------------------------------------------------------------------
# Backward (VJP) kernel for the chord loss
# ---------------------------------------------------------------------------


def chord_bwd_kernel(counts, names, dens_keys, *refs_list):
    """VJP of chord_loss_kernel: given per-ray cotangents ``gbar``, emit
    per-ray gradients w.r.t. ray origin/direction and per-primitive
    gradients w.r.t. density.

    Derivatives come from jax.vjp applied to the same per-primitive math
    as the forward (exact transposition, no hand-derived case analysis).
    Per-primitive density cotangents accumulate into grid-invariant SMEM
    outputs across ray blocks — safe because the TPU grid is sequential.
    """
    ns, na, no = counts
    n_dens = len(dens_keys)
    refs = dict(zip(names, refs_list[:len(names)]))
    skip_ref = refs_list[len(names)]
    outs = refs_list[len(names) + 1:]
    do_refs = outs[:6]
    dens_refs = dict(zip(dens_keys, outs[6:6 + n_dens]))
    skip = skip_ref[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dens_refs.values():
            def zero(i, _):
                ref[i] = 0.0
                return 0
            jax.lax.fori_loop(0, ref.shape[0], zero, 0)

    ox, oy, oz = refs["ox"][...], refs["oy"][...], refs["oz"][...]
    dx, dy, dz = refs["dx"][...], refs["dy"][...], refs["dz"][...]
    g = refs["gbar"][...]

    acc = tuple(jnp.zeros(ox.shape, jnp.float32) for _ in range(6))

    def grads(f, dens):
        """vjp of the per-prim weighted chord w.r.t. rays + scalar dens."""
        w, vjp = jax.vjp(f, ox, oy, oz, dx, dy, dz, dens)
        *g_rays, g_dens = vjp(g)
        return g_rays, g_dens

    if ns:
        def s_body(p, acc):
            def f(ox, oy, oz, dx, dy, dz, dens):
                return _sphere_chord(refs, p, skip, ox, oy, oz, dx, dy, dz,
                                     dens)
            g_rays, g_dens = grads(f, refs["s_dens"][p])
            dens_refs["s_dens"][p] += g_dens
            return tuple(a + gg for a, gg in zip(acc, g_rays))
        acc = jax.lax.fori_loop(0, ns, s_body, acc)

    if na:
        def a_body(p, acc):
            def f(ox, oy, oz, dx, dy, dz, dens):
                ix = 1.0 / _safe_dir(dx)
                iy = 1.0 / _safe_dir(dy)
                iz = 1.0 / _safe_dir(dz)
                return _aabb_chord(refs, p, skip, ox, oy, oz, ix, iy, iz,
                                   dens)
            g_rays, g_dens = grads(f, refs["a_dens"][p])
            dens_refs["a_dens"][p] += g_dens
            return tuple(a + gg for a, gg in zip(acc, g_rays))
        acc = jax.lax.fori_loop(0, na, a_body, acc)

    if no:
        def o_body(p, acc):
            def f(ox, oy, oz, dx, dy, dz, dens):
                return _obb_chord(refs, p, skip, ox, oy, oz, dx, dy, dz,
                                  dens)
            g_rays, g_dens = grads(f, refs["o_dens"][p])
            dens_refs["o_dens"][p] += g_dens
            return tuple(a + gg for a, gg in zip(acc, g_rays))
        acc = jax.lax.fori_loop(0, no, o_body, acc)

    for ref, a in zip(do_refs, acc):
        ref[...] = a


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _prim_spec():
    # Whole 1-D scalar array, grid-invariant, resident in SMEM.
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _ray_spec():
    # Ray arrays are (rp/RAY_COLS, RAY_COLS); each grid step stages the
    # 8-row band (8, RAY_COLS) at rows [8i, 8i+8).
    return pl.BlockSpec((ROWS, RAY_COLS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _round_block(R):
    return -(-R // RAY_BLOCK) * RAY_BLOCK


def _pad_rays(x, rp):
    """[R] -> (rp/RAY_COLS, RAY_COLS) row-major (a free reshape)."""
    r = x.shape[0]
    if r != rp:
        x = jnp.concatenate([x, jnp.zeros((rp - r,), x.dtype)])
    return x.reshape(rp // RAY_COLS, RAY_COLS)


def _unpack_rays(x, R):
    """(rp/RAY_COLS, RAY_COLS) -> [R]."""
    return x.reshape(-1)[:R]


def _grid(rp):
    return (rp // RAY_BLOCK,)


def _ray_out(rp, dtype, vma=frozenset()):
    return jax.ShapeDtypeStruct((rp // RAY_COLS, RAY_COLS), dtype, vma=vma)


def _out_vma(*operands):
    """Union of the operands' varying-manifest-axes, so pallas_call
    outputs type-check under shard_map's check_vma (outputs vary over
    every mesh axis any input varies over)."""
    vma = frozenset()
    for group in operands:
        for a in (group if isinstance(group, (list, tuple)) else [group]):
            v = getattr(jax.typeof(a), "vma", None)
            if v:
                vma |= v
    return vma


def run_closest_hit(prim_fields: dict, counts, o, d, interpret=False):
    """o, d: [R, 3] -> (t [R] (+inf miss), rank [R] int32).

    ``prim_fields``: dict of 1-D scalar arrays (see PallasBackend);
    ``counts``: true (ns, na, no).
    """
    R = o.shape[0]
    rp = _round_block(R)
    names = list(prim_fields.keys())
    geom = [k for k in names
            if not k.endswith("_tgt") and not k.endswith("_dens")]
    fields = {k: prim_fields[k] for k in geom}
    ray_names = ["ox", "oy", "oz", "dx", "dy", "dz"]
    rays = [_pad_rays(o[:, 0], rp), _pad_rays(o[:, 1], rp),
            _pad_rays(o[:, 2], rp), _pad_rays(d[:, 0], rp),
            _pad_rays(d[:, 1], rp), _pad_rays(d[:, 2], rp)]
    # Padded rays have d = 0 -> nudged dirs; results sliced off anyway.

    all_names = ray_names + list(fields.keys())
    kernel = functools.partial(closest_hit_kernel, counts, all_names)
    vma = _out_vma(rays, list(fields.values()))
    t, win = pl.pallas_call(
        kernel,
        grid=_grid(rp),
        in_specs=[_ray_spec()] * 6 + [_prim_spec()] * len(fields),
        out_specs=[_ray_spec(), _ray_spec()],
        out_shape=[_ray_out(rp, jnp.float32, vma),
                   _ray_out(rp, jnp.int32, vma)],
        interpret=interpret,
    )(*rays, *fields.values())
    t = _unpack_rays(t, R)
    t = jnp.where(t >= BIG, jnp.inf, t)
    return t, _unpack_rays(win, R)


def run_any_hit(prim_fields: dict, counts, o, d, limit, skip_id,
                interpret=False):
    """Occlusion test -> bool [R]. ``skip_id``: scalar int32 (-1 = none)."""
    R = o.shape[0]
    rp = _round_block(R)
    names = [k for k in prim_fields if not k.endswith("_dens")]
    fields = {k: prim_fields[k] for k in names}
    ray_names = ["ox", "oy", "oz", "dx", "dy", "dz", "limit"]
    rays = [_pad_rays(o[:, 0], rp), _pad_rays(o[:, 1], rp),
            _pad_rays(o[:, 2], rp), _pad_rays(d[:, 0], rp),
            _pad_rays(d[:, 1], rp), _pad_rays(d[:, 2], rp),
            _pad_rays(jnp.broadcast_to(limit, (R,)), rp)]
    skip = jnp.asarray(skip_id, jnp.int32).reshape(1)

    all_names = ray_names + list(fields.keys())
    kernel = functools.partial(any_hit_kernel, counts, all_names)
    vma = _out_vma(rays, list(fields.values()), skip)
    occ = pl.pallas_call(
        kernel,
        grid=_grid(rp),
        in_specs=([_ray_spec()] * 7 + [_prim_spec()] * len(fields)
                  + [_prim_spec()]),
        out_specs=_ray_spec(),
        out_shape=_ray_out(rp, jnp.int32, vma),
        interpret=interpret,
    )(*rays, *fields.values(), skip)
    return _unpack_rays(occ, R) > 0


def run_chord_loss(prim_fields: dict, counts, o, d, skip_id,
                   interpret=False):
    """Permeation chord-loss sums -> f32 [R]."""
    R = o.shape[0]
    rp = _round_block(R)
    names = list(prim_fields.keys())
    ray_names = ["ox", "oy", "oz", "dx", "dy", "dz"]
    rays = [_pad_rays(o[:, 0], rp), _pad_rays(o[:, 1], rp),
            _pad_rays(o[:, 2], rp), _pad_rays(d[:, 0], rp),
            _pad_rays(d[:, 1], rp), _pad_rays(d[:, 2], rp)]
    skip = jnp.asarray(skip_id, jnp.int32).reshape(1)

    all_names = ray_names + names
    kernel = functools.partial(chord_loss_kernel, counts, all_names)
    vma = _out_vma(rays, list(prim_fields.values()), skip)
    loss = pl.pallas_call(
        kernel,
        grid=_grid(rp),
        in_specs=([_ray_spec()] * 6 + [_prim_spec()] * len(names)
                  + [_prim_spec()]),
        out_specs=_ray_spec(),
        out_shape=_ray_out(rp, jnp.float32, vma),
        interpret=interpret,
    )(*rays, *prim_fields.values(), skip)
    return _unpack_rays(loss, R)


def run_chord_loss_bwd(prim_fields: dict, counts, o, d, skip_id, gbar,
                       interpret=False):
    """VJP wrapper: (d_o [R,3], d_d [R,3], {dens_key: 1-D prim grads}).

    ``gbar``: [R] cotangent of the per-ray loss.
    """
    R = o.shape[0]
    rp = _round_block(R)
    names = list(prim_fields.keys())
    dens_keys = [k for k in names if k.endswith("_dens")]
    ray_names = ["ox", "oy", "oz", "dx", "dy", "dz", "gbar"]
    rays = [_pad_rays(o[:, 0], rp), _pad_rays(o[:, 1], rp),
            _pad_rays(o[:, 2], rp), _pad_rays(d[:, 0], rp),
            _pad_rays(d[:, 1], rp), _pad_rays(d[:, 2], rp),
            _pad_rays(gbar, rp)]  # zero-padded gbar: padding contributes 0
    skip = jnp.asarray(skip_id, jnp.int32).reshape(1)

    all_names = ray_names + names
    kernel = functools.partial(chord_bwd_kernel, counts, all_names, dens_keys)
    vma = _out_vma(rays, list(prim_fields.values()), skip)
    dens_out = [jax.ShapeDtypeStruct(prim_fields[k].shape, jnp.float32,
                                     vma=vma)
                for k in dens_keys]
    outs = pl.pallas_call(
        kernel,
        grid=_grid(rp),
        in_specs=([_ray_spec()] * 7 + [_prim_spec()] * len(names)
                  + [_prim_spec()]),
        out_specs=[_ray_spec()] * 6 + [_prim_spec()] * len(dens_keys),
        out_shape=[_ray_out(rp, jnp.float32, vma)] * 6 + dens_out,
        interpret=interpret,
    )(*rays, *prim_fields.values(), skip)
    d_o = jnp.stack([_unpack_rays(outs[i], R) for i in range(3)], axis=-1)
    d_d = jnp.stack([_unpack_rays(outs[i], R) for i in range(3, 6)], axis=-1)
    dens_grads = dict(zip(dens_keys, outs[6:]))
    return d_o, d_d, dens_grads
