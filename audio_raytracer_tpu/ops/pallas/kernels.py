"""Pallas TPU kernels for the rays x primitives hot loops.

Replaces the Burst SIMD tier of the reference
(Jobs/AudioRaytracerJobBatched.cs:225-449, AudioPermeationJobBatched.cs)
with VPU kernels designed for the TPU register file:

- Rays live in the LANE dimension: a grid step processes a tile of
  ``RAY_TILE`` rays as (1, RAY_TILE) vectors; per-ray values (origin,
  direction, limits) are full-lane vector loads.
- Primitives stream through the SUBLANE dimension 8 at a time: each field
  chunk is an (8, 1) vector load broadcast against the ray tile, so every
  VPU op covers 8 x RAY_TILE (ray, prim) pairs — no scalar extraction,
  no [R, P] materialization in HBM (the jnp tier OOMs at 1M x 4K; this
  tier streams).
- Closest-hit keeps running (8, RAY_TILE) min-distance / min-rank
  registers with a strict ``<`` update (earlier scan rank wins ties,
  reproducing the reference's sphere->AABB->OBB scan order), then does a
  single cross-sublane reduce with an explicit rank tie-break.
- All prim fields are padded to multiples of 8; inactive padding encodes
  guaranteed misses (negative squared radius for spheres, a +inf
  ``miss_add`` term for boxes).

Scene data totals ~25 f32 fields x P, resident in VMEM across the whole
grid (constant index_map), so per-kernel HBM traffic is O(R), not O(R*P).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE = 512
# Mosaic requires the sublane block dim divisible by 8, so a grid step
# takes an (8, RAY_TILE) block = ROWS * RAY_TILE rays, processed as 8
# independent sub-rows of RAY_TILE rays each.
ROWS = 8
RAY_BLOCK = ROWS * RAY_TILE
CHUNK = 8
# Python literals (not jnp constants): the kernel must not capture arrays.
INT_MAX = 2**31 - 1
BIG = 3.0e38


def _pad8(n: int) -> int:
    return -(-n // CHUNK) * CHUNK


def _iota8():
    return jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)


def _safe_dir(d):
    # Zero-axis nudge, mirroring ops/intersect._aabb_slab.
    return jnp.where(jnp.abs(d) < 1e-12,
                     jnp.where(d >= 0, jnp.float32(1e-12),
                               jnp.float32(-1e-12)), d)


# ---------------------------------------------------------------------------
# Per-chunk primitive tests (shared by the three kernels)
# ---------------------------------------------------------------------------


def _sphere_t(refs, c, ox, oy, oz, dx, dy, dz, a2, inv2a):
    """Sphere hit distance for chunk c: (CHUNK, RAY_TILE); +inf = miss.

    Full quadratic with a = dot(d, d), near root preferred
    (AudioRaytracerJobBatched.cs:323-355). a2 = 2a, inv2a = 1/(2a),
    precomputed per ray tile.
    """
    s = pl.ds(c * CHUNK, CHUNK)
    cx, cy, cz = refs["s_cx"][s, :], refs["s_cy"][s, :], refs["s_cz"][s, :]
    r2 = refs["s_r2"][s, :]
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
    """Slab test given per-pair mins/maxs and inverse dirs. Returns
    (t, t_enter, t_exit, miss): t per reference select (tNear if > 0 else
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


def _aabb_t(refs, c, ox, oy, oz, ix, iy, iz):
    s = pl.ds(c * CHUNK, CHUNK)
    t, _, _, miss = _slab_t(
        refs["a_minx"][s, :], refs["a_miny"][s, :], refs["a_minz"][s, :],
        refs["a_maxx"][s, :], refs["a_maxy"][s, :], refs["a_maxz"][s, :],
        ox, oy, oz, ix, iy, iz)
    return jnp.where(miss, BIG, t) + refs["a_miss"][s, :]


def _quat_rotate(qx, qy, qz, qw, vx, vy, vz):
    """Rotate (vx,vy,vz) by quaternion chunk (qx..qw are (CHUNK,1)):
    v' = v + w*t + q x t with t = 2 q x v. Broadcasts to (CHUNK, RAY_TILE).
    """
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    rx = vx + qw * tx + (qy * tz - qz * ty)
    ry = vy + qw * ty + (qz * tx - qx * tz)
    rz = vz + qw * tz + (qx * ty - qy * tx)
    return rx, ry, rz


def _obb_local(refs, c, ox, oy, oz, dx, dy, dz):
    """Rotate ray into the OBB chunk's local frame using the stored
    (pre-inverted) quaternion. Returns local origin and direction."""
    s = pl.ds(c * CHUNK, CHUNK)
    cx, cy, cz = refs["o_cx"][s, :], refs["o_cy"][s, :], refs["o_cz"][s, :]
    qx, qy, qz = refs["o_qx"][s, :], refs["o_qy"][s, :], refs["o_qz"][s, :]
    qw = refs["o_qw"][s, :]
    lox, loy, loz = _quat_rotate(qx, qy, qz, qw, ox - cx, oy - cy, oz - cz)
    ldx, ldy, ldz = _quat_rotate(qx, qy, qz, qw,
                                 jnp.broadcast_to(dx, lox.shape),
                                 jnp.broadcast_to(dy, lox.shape),
                                 jnp.broadcast_to(dz, lox.shape))
    return lox, loy, loz, ldx, ldy, ldz


def _obb_t(refs, c, ox, oy, oz, dx, dy, dz):
    s = pl.ds(c * CHUNK, CHUNK)
    hx, hy, hz = refs["o_hx"][s, :], refs["o_hy"][s, :], refs["o_hz"][s, :]
    lox, loy, loz, ldx, ldy, ldz = _obb_local(refs, c, ox, oy, oz, dx, dy, dz)
    ldx, ldy, ldz = _safe_dir(ldx), _safe_dir(ldy), _safe_dir(ldz)
    ix, iy, iz = 1.0 / ldx, 1.0 / ldy, 1.0 / ldz
    t, _, _, miss = _slab_t(-hx, -hy, -hz, hx, hy, hz,
                            lox, loy, loz, ix, iy, iz)
    return jnp.where(miss, BIG, t) + refs["o_miss"][s, :]


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _ray_tile_inputs(ray_refs, r):
    """Per-ray fields for sub-row r as (1, RAY_TILE) vectors."""
    sl = slice(r, r + 1)
    ox, oy, oz = (ray_refs["ox"][sl, :], ray_refs["oy"][sl, :],
                  ray_refs["oz"][sl, :])
    dx, dy, dz = (ray_refs["dx"][sl, :], ray_refs["dy"][sl, :],
                  ray_refs["dz"][sl, :])
    sdx, sdy, sdz = _safe_dir(dx), _safe_dir(dy), _safe_dir(dz)
    ix, iy, iz = 1.0 / sdx, 1.0 / sdy, 1.0 / sdz
    a = dx * dx + dy * dy + dz * dz
    return ox, oy, oz, dx, dy, dz, ix, iy, iz, a


def closest_hit_kernel(counts, names, *refs_list):
    """Grid step: one ray tile vs all primitives -> (t_min, winner rank)."""
    ns, na, no = counts
    refs = dict(zip(names, refs_list[:-2]))
    t_out, win_out = refs_list[-2], refs_list[-1]
    iota = _iota8()

    for r in range(ROWS):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, a = _ray_tile_inputs(refs, r)
        a2 = 2.0 * a
        inv2a = 1.0 / a2

        shape = (CHUNK, ox.shape[-1])
        best_t = jnp.full(shape, BIG, jnp.float32)
        best_i = jnp.full(shape, INT_MAX, jnp.int32)

        def update(best, t, rank0, c):
            bt, bi = best
            rank = rank0 + c * CHUNK + iota
            upd = t < bt
            return (jnp.where(upd, t, bt),
                    jnp.where(upd, jnp.broadcast_to(rank, shape), bi))

        if ns:
            def s_body(c, best):
                return update(best, _sphere_t(refs, c, ox, oy, oz,
                                              dx, dy, dz, a2, inv2a), 0, c)
            best_t, best_i = jax.lax.fori_loop(0, ns // CHUNK, s_body,
                                               (best_t, best_i))
        if na:
            def a_body(c, best):
                return update(best, _aabb_t(refs, c, ox, oy, oz, ix, iy, iz),
                              ns, c)
            best_t, best_i = jax.lax.fori_loop(0, na // CHUNK, a_body,
                                               (best_t, best_i))
        if no:
            def o_body(c, best):
                return update(best, _obb_t(refs, c, ox, oy, oz, dx, dy, dz),
                              ns + na, c)
            best_t, best_i = jax.lax.fori_loop(0, no // CHUNK, o_body,
                                               (best_t, best_i))

        # Cross-sublane reduce; rank breaks ties (reference scan order).
        m = jnp.min(best_t, axis=0, keepdims=True)
        cand = jnp.where(best_t == m, best_i, INT_MAX)
        t_out[r:r + 1, :] = m
        win_out[r:r + 1, :] = jnp.min(cand, axis=0, keepdims=True)


def any_hit_kernel(counts, names, *refs_list):
    """Occlusion: any primitive with t < limit, skipping prims owned by
    the scalar ``skip`` target id (SMEM)."""
    ns, na, no = counts
    refs = dict(zip(names, refs_list[:-2]))
    skip_ref, occ_out = refs_list[-2], refs_list[-1]
    skip = skip_ref[0, 0]

    for r in range(ROWS):
        ox, oy, oz, dx, dy, dz, ix, iy, iz, a = _ray_tile_inputs(refs, r)
        a2 = 2.0 * a
        inv2a = 1.0 / a2
        limit = refs["limit"][r:r + 1, :]

        shape = (CHUNK, ox.shape[-1])
        acc = jnp.zeros(shape, jnp.int32)

        def hit_mask(t, tgt):
            keep = tgt != skip
            return ((t < limit) & keep).astype(jnp.int32)

        if ns:
            def s_body(c, acc):
                t = _sphere_t(refs, c, ox, oy, oz, dx, dy, dz, a2, inv2a)
                return acc | hit_mask(
                    t, refs["s_tgt"][pl.ds(c * CHUNK, CHUNK), :])
            acc = jax.lax.fori_loop(0, ns // CHUNK, s_body, acc)
        if na:
            def a_body(c, acc):
                t = _aabb_t(refs, c, ox, oy, oz, ix, iy, iz)
                return acc | hit_mask(
                    t, refs["a_tgt"][pl.ds(c * CHUNK, CHUNK), :])
            acc = jax.lax.fori_loop(0, na // CHUNK, a_body, acc)
        if no:
            def o_body(c, acc):
                t = _obb_t(refs, c, ox, oy, oz, dx, dy, dz)
                return acc | hit_mask(
                    t, refs["o_tgt"][pl.ds(c * CHUNK, CHUNK), :])
            acc = jax.lax.fori_loop(0, no // CHUNK, o_body, acc)

        occ_out[r:r + 1, :] = jnp.max(acc, axis=0, keepdims=True)


def chord_loss_kernel(counts, names, *refs_list):
    """Permeation: sum over primitives of chord-length x density
    (AudioPermeationJobBatched.cs:225-328), skipping the scalar target's
    own colliders. Direction is assumed normalized (the half-b sphere
    variant of the reference)."""
    ns, na, no = counts
    refs = dict(zip(names, refs_list[:-2]))
    skip_ref, loss_out = refs_list[-2], refs_list[-1]
    skip = skip_ref[0, 0]

    for r in range(ROWS):
        _chord_row(counts, refs, skip, loss_out, r)


def _chord_row(counts, refs, skip, loss_out, r):
    ns, na, no = counts
    ox, oy, oz, dx, dy, dz, ix, iy, iz, _ = _ray_tile_inputs(refs, r)
    shape = (CHUNK, ox.shape[-1])
    acc = jnp.zeros(shape, jnp.float32)

    if ns:
        def s_body(c, acc):
            s = pl.ds(c * CHUNK, CHUNK)
            cx, cy, cz = (refs["s_cx"][s, :], refs["s_cy"][s, :],
                          refs["s_cz"][s, :])
            r2, dens = refs["s_r2"][s, :], refs["s_dens"][s, :]
            tgt = refs["s_tgt"][s, :]
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
            return acc + jnp.where(valid, chord, 0.0) * dens
        acc = jax.lax.fori_loop(0, ns // CHUNK, s_body, acc)

    if na:
        def a_body(c, acc):
            s = pl.ds(c * CHUNK, CHUNK)
            _, t_near, t_far, _ = _slab_t(
                refs["a_minx"][s, :], refs["a_miny"][s, :],
                refs["a_minz"][s, :], refs["a_maxx"][s, :],
                refs["a_maxy"][s, :], refs["a_maxz"][s, :],
                ox, oy, oz, ix, iy, iz)
            chord = jnp.maximum(0.0, t_far - jnp.maximum(t_near, 0.0))
            valid = ((t_near <= t_far) & (t_far >= 0.0)
                     & (refs["a_tgt"][s, :] != skip)
                     & (refs["a_miss"][s, :] == 0.0))
            return acc + jnp.where(valid, chord, 0.0) * refs["a_dens"][s, :]
        acc = jax.lax.fori_loop(0, na // CHUNK, a_body, acc)

    if no:
        def o_body(c, acc):
            s = pl.ds(c * CHUNK, CHUNK)
            hx, hy, hz = (refs["o_hx"][s, :], refs["o_hy"][s, :],
                          refs["o_hz"][s, :])
            lox, loy, loz, ldx, ldy, ldz = _obb_local(
                refs, c, ox, oy, oz, dx, dy, dz)
            ldx, ldy, ldz = _safe_dir(ldx), _safe_dir(ldy), _safe_dir(ldz)
            _, t_near, t_far, _ = _slab_t(
                -hx, -hy, -hz, hx, hy, hz, lox, loy, loz,
                1.0 / ldx, 1.0 / ldy, 1.0 / ldz)
            chord = jnp.maximum(0.0, t_far - jnp.maximum(t_near, 0.0))
            valid = ((t_near <= t_far) & (t_far >= 0.0)
                     & (refs["o_tgt"][s, :] != skip)
                     & (refs["o_miss"][s, :] == 0.0))
            return acc + jnp.where(valid, chord, 0.0) * refs["o_dens"][s, :]
        acc = jax.lax.fori_loop(0, no // CHUNK, o_body, acc)

    loss_out[r:r + 1, :] = jnp.sum(acc, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _prim_spec():
    # Whole-array block, grid-invariant: resident in VMEM across the grid.
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _ray_spec():
    # Ray arrays are row-blocked (R/RAY_TILE, RAY_TILE); each grid step
    # stages an (ROWS, RAY_TILE) block = RAY_BLOCK rays in VMEM.
    return pl.BlockSpec((ROWS, RAY_TILE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _pad_rays(x, rp):
    r = x.shape[0]
    if r != rp:
        x = jnp.concatenate([x, jnp.zeros((rp - r,), x.dtype)])
    return x.reshape(rp // RAY_TILE, RAY_TILE)


def _round_block(R):
    return -(-R // RAY_BLOCK) * RAY_BLOCK


def run_closest_hit(prim_fields: dict, counts, o, d, interpret=False):
    """o, d: [R, 3] -> (t [R] (+inf miss), rank [R] int32)."""
    R = o.shape[0]
    rp = _round_block(R)
    names = list(prim_fields.keys())
    ray_names = ["ox", "oy", "oz", "dx", "dy", "dz"]
    rays = [_pad_rays(o[:, 0], rp), _pad_rays(o[:, 1], rp),
            _pad_rays(o[:, 2], rp), _pad_rays(d[:, 0], rp),
            _pad_rays(d[:, 1], rp), _pad_rays(d[:, 2], rp)]
    # Padded rays have d = 0 -> nudged dirs; results sliced off anyway.

    all_names = ray_names + names
    kernel = functools.partial(closest_hit_kernel, counts, all_names)
    t, win = pl.pallas_call(
        kernel,
        grid=(rp // RAY_BLOCK,),
        in_specs=[_ray_spec()] * 6 + [_prim_spec()] * len(names),
        out_specs=[_ray_spec(), _ray_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((rp // RAY_TILE, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((rp // RAY_TILE, RAY_TILE), jnp.int32)],
        interpret=interpret,
    )(*rays, *prim_fields.values())
    t = t.reshape(rp)[:R]
    t = jnp.where(t >= BIG, jnp.inf, t)
    return t, win.reshape(rp)[:R]


def run_any_hit(prim_fields: dict, counts, o, d, limit, skip_id,
                interpret=False):
    """Occlusion test -> bool [R]. ``skip_id``: scalar int32 (-1 = none)."""
    R = o.shape[0]
    rp = _round_block(R)
    names = list(prim_fields.keys())
    ray_names = ["ox", "oy", "oz", "dx", "dy", "dz", "limit"]
    rays = [_pad_rays(o[:, 0], rp), _pad_rays(o[:, 1], rp),
            _pad_rays(o[:, 2], rp), _pad_rays(d[:, 0], rp),
            _pad_rays(d[:, 1], rp), _pad_rays(d[:, 2], rp),
            _pad_rays(jnp.broadcast_to(limit, (R,)), rp)]
    skip = jnp.asarray(skip_id, jnp.int32).reshape(1, 1)

    all_names = ray_names + names
    kernel = functools.partial(any_hit_kernel, counts, all_names)
    occ = pl.pallas_call(
        kernel,
        grid=(rp // RAY_BLOCK,),
        in_specs=([_ray_spec()] * 7 + [_prim_spec()] * len(names)
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_specs=_ray_spec(),
        out_shape=jax.ShapeDtypeStruct((rp // RAY_TILE, RAY_TILE),
                                       jnp.int32),
        interpret=interpret,
    )(*rays, *prim_fields.values(), skip)
    return occ.reshape(rp)[:R] > 0


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
    skip = jnp.asarray(skip_id, jnp.int32).reshape(1, 1)

    all_names = ray_names + names
    kernel = functools.partial(chord_loss_kernel, counts, all_names)
    loss = pl.pallas_call(
        kernel,
        grid=(rp // RAY_BLOCK,),
        in_specs=([_ray_spec()] * 6 + [_prim_spec()] * len(names)
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_specs=_ray_spec(),
        out_shape=jax.ShapeDtypeStruct((rp // RAY_TILE, RAY_TILE),
                                       jnp.float32),
        interpret=interpret,
    )(*rays, *prim_fields.values(), skip)
    return loss.reshape(rp)[:R]
