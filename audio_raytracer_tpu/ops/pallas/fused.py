"""Fused multi-ray-set Pallas kernels: ONE primitive stream per bounce.

The reference's inner loop does closest-hit, echo occlusion, and per-target
muffle occlusion in a single pass over the collider arrays per bounce
(Jobs/AudioRaytracerJobBatched.cs:104-207), and the permeation job
integrates chords toward every target in one pass
(Jobs/AudioPermeationJobBatched.cs:57-89). Round 1 split these into
(2 + T) separate kernel launches per bounce — ~34 full rays x prims
primitive scans per step at T=4, bounces=4. These kernels restore the
reference's one-stream structure on the TPU:

- ``multi_any_hit``: S ray sets sharing ONE origin block (the bounce's
  epsilon-offset hit points) with S directions/limits (echo ray + T muffle
  rays). Each primitive's fields are loaded from SMEM once and tested
  against all S sets; per-primitive terms that do not depend on the ray
  direction (sphere center offsets/|oc|^2, slab bounds minus origin, the
  OBB-local origin) are computed once and reused across sets. Results are
  S per-ray occlusion flags (f32 0/1 accumulators — one select per
  (prim, set) instead of int32 bitmask arithmetic).
- ``multi_chord``: permeation chord-length x density sums for S target
  ray sets in one stream, same sharing structure.
- ``multi_chord_bwd``: hand-closed adjoints of multi_chord (no jax.vjp
  re-linearization per primitive like round 1's chord_bwd_kernel) —
  gradients to the shared origin, each set's direction, and per-primitive
  material density.

Blocks that are fully pre-resolved (every lane dead / pre-occluded via
``init`` bits) skip the primitive stream entirely — the TPU analog of the
reference's early-exit for dead rays (cs:104).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_raytracer_tpu.ops.backend import NO_SKIP
from audio_raytracer_tpu.ops.pallas.kernels import (
    BIG,
    INT_MAX,
    RAY_COLS,
    ROWS,
    _cast_refs,
    _f32,
    _grid,
    _inv_dir,
    _mat_rotate,
    _mat_rotate_t,
    _match_vma,
    _neg,
    _out_vma,
    _pad_rays,
    _prim_spec,
    _ray_out,
    _ray_spec,
    _round_block,
    _rows,
    _safe_dir,
    _unpack_rays,
)

Array = jnp.ndarray


def _pad_rays_fill(x, rp, fill):
    """[R] -> (rp/RAY_COLS, RAY_COLS) with ``fill`` in the padding lanes."""
    r = x.shape[0]
    if r != rp:
        x = jnp.concatenate([x, jnp.full((rp - r,), fill, x.dtype)])
    from audio_raytracer_tpu.ops.pallas.kernels import RAY_COLS

    return x.reshape(rp // RAY_COLS, RAY_COLS)


# ---------------------------------------------------------------------------
# Per-set ray-block preparation (inside kernels)
# ---------------------------------------------------------------------------


def _load_sets(refs, n_sets, with_limits):
    """Load S direction sets (+ limits) and precompute per-set terms.

    Inverse directions go through the f32 division island (_inv_dir);
    limits load raw f32 (they live in the cmp domain)."""
    sets = []
    for s in range(n_sets):
        dx = refs[f"d{s}x"][...]
        dy = refs[f"d{s}y"][...]
        dz = refs[f"d{s}z"][...]
        ix, iy, iz = _inv_dir(dx, dy, dz, dx)
        lim = refs[f"l{s}"][...] if with_limits else None
        sets.append(dict(dx=dx, dy=dy, dz=dz, ix=ix, iy=iy, iz=iz,
                         lim=lim))
    return sets


# ---------------------------------------------------------------------------
# multi_any_hit: occlusion bitmask over S ray sets, one primitive stream
# ---------------------------------------------------------------------------


def multi_any_hit_kernel(counts, skips, names, cdt, cull, *refs_list):
    """Per ray block: S occlusion flags (1.0 = ray set s occluded).

    ``skips`` is a static tuple of per-set audio-target ids to skip
    (CanRaySeeAudioTarget's AudioTargetId exclusion,
    AudioRaytracerJobBatched.cs:405-449); NO_SKIP for the echo set.

    ``cull``: when True, an extra SMEM input carries each set's
    CONVERGENCE POINT (all of a set's rays end at one point: the
    listener origin for the echo set, the target position for muffle
    sets — their ray segments therefore lie inside the convex hull of
    {block origin box} u {point}). Per primitive, a scalar-core test
    rejects primitives whose bounding sphere misses the axis-aligned
    bound of every set's hull, and a lax.cond skips the whole
    per-primitive vector body — brute-force work removal the reference
    never had, sound because a culled primitive cannot intersect any
    tested segment. (The cull runs only in the f32 tier: the bf16
    tier's own coordinate/t rounding would defeat the conservative
    margin, so run_multi_any_hit statically ignores the hint there.)

    Directions MUST be normalized (they are: safe_normalize in
    ops.trace) — the sphere test exploits |d| == 1 to resolve the
    reference's root-select semantics (cs:323-355: t = t0 if t0 >= 0
    else t1 if t1 >= 0 else miss; occluded iff t < lim) entirely in the
    sign domain, with no sqrt and no division:
      h = oc . d, c = |oc|^2 - r^2, roots t0/t1 = -h -/+ sqrt(h^2 - c)
      t0 >= 0        <=> h <= 0 and c >= 0
      t0 <  lim      <=> h + lim > 0  or  q(lim) < 0
      t1 in [0, lim) <=> c < 0 branch: h + lim > 0 and q(lim) > 0
    where q(lim) = lim^2 + 2 h lim + c is the quadratic at t = lim.
    Occlusion state accumulates as a float select per set (1 VPU op)
    instead of int32 bitmask arithmetic.
    """
    ns, na, no = counts
    S = len(skips)
    keep = {f"l{s}" for s in range(S)} | {f"i{s}" for s in range(S)}
    refs = _cast_refs(dict(zip(names, refs_list[:len(names)])), cdt, keep)
    pos = len(names)
    conv = refs_list[pos] if cull else None
    pos += 1 if cull else 0
    outs = refs_list[pos:pos + S]

    inits = [refs[f"i{s}"][...] for s in range(S)]
    pre_blk = inits[0]
    for s in range(1, S):
        pre_blk = jnp.minimum(pre_blk, inits[s])
    # Scalar registers are 32-bit: reduce to scalar in f32.
    pre = jnp.min(pre_blk.astype(jnp.float32))

    @pl.when(pre >= 0.5)
    def _done():
        # Whole block pre-resolved (dead / out-of-range lanes): skip the
        # primitive stream.
        for out, ini in zip(outs, inits):
            out[...] = ini

    # Ray-block loads live OUTSIDE the skip branch: values loaded inside
    # a pl.when closure lose their varying-manual-axes type under a
    # compiled shard_map trace, which breaks the fori carry typing (the
    # block DMA happens per grid step regardless, so this costs ~nothing
    # on skipped blocks).
    ox, oy, oz = refs["ox"][...], refs["oy"][...], refs["oz"][...]
    sets = _load_sets(refs, S, with_limits=True)

    @pl.when(pre < 0.5)
    def _scan():
        one = 1.0  # weak literal: stays in the compute dtype

        if cull:
            # Per-block origin box (cross-lane reduces; dead/moot lanes
            # only loosen it) -> per-set hull bounds = AABB(box u conv).
            oxl, oxh = jnp.min(_f32(ox)), jnp.max(_f32(ox))
            oyl, oyh = jnp.min(_f32(oy)), jnp.max(_f32(oy))
            ozl, ozh = jnp.min(_f32(oz)), jnp.max(_f32(oz))
            hulls = []
            for s in range(S):
                cvx, cvy, cvz = conv[3 * s], conv[3 * s + 1], conv[3 * s + 2]
                hulls.append((jnp.minimum(oxl, cvx), jnp.maximum(oxh, cvx),
                              jnp.minimum(oyl, cvy), jnp.maximum(oyh, cvy),
                              jnp.minimum(ozl, cvz), jnp.maximum(ozh, cvz)))

        def _keep(bcx, bcy, bcz, br2):
            """Scalar: does sphere(bc, sqrt(br2)) touch ANY set's hull
            AABB? br2 < 0 encodes inactive (always culled)."""
            k = None
            for s in range(S):
                xl, xh, yl, yh, zl, zh = hulls[s]
                dx = jnp.maximum(jnp.maximum(xl - bcx, bcx - xh), 0.0)
                dy = jnp.maximum(jnp.maximum(yl - bcy, bcy - yh), 0.0)
                dz = jnp.maximum(jnp.maximum(zl - bcz, bcz - zh), 0.0)
                ks = dx * dx + dy * dy + dz * dz <= br2
                k = ks if k is None else (k | ks)
            return k

        def _maybe(p, accs, keep_args, body):
            """Wrap a per-prim body in the cull cond."""
            if not cull:
                return body(p, accs)
            return jax.lax.cond(_keep(*keep_args), lambda: body(p, accs),
                                lambda: accs)

        def s_body(p, accs):
            cx, cy, cz = refs["s_cx"][p], refs["s_cy"][p], refs["s_cz"][p]
            r2, tgt = refs["s_r2"][p], refs["s_tgt"][p]
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            c = _f32(ocx * ocx + ocy * ocy + ocz * ocz) - _f32(r2)
            c_pos = c >= 0.0
            c_neg = ~c_pos
            new = []
            for s, st in enumerate(sets):
                h = _f32(ocx * st["dx"] + ocy * st["dy"] + ocz * st["dz"])
                lim = st["lim"]
                hl = h + lim
                q = lim * (hl + h) + c  # lim^2 + 2 h lim + c
                entering = c_pos & (h <= 0.0) & ((hl > 0.0) | (q < 0.0))
                inside = c_neg & (hl > 0.0) & (q > 0.0)
                occ = (h * h >= c) & (entering | inside)
                if skips[s] != NO_SKIP:  # echo set: statically no skip
                    occ = occ & (tgt != skips[s])
                new.append(_match_vma(jnp.where(occ, one, accs[s]),
                                      accs[s]))
            return tuple(new)

        def a_body(p, accs):
            mnx = refs["a_minx"][p] - ox
            mny = refs["a_miny"][p] - oy
            mnz = refs["a_minz"][p] - oz
            mxx = refs["a_maxx"][p] - ox
            mxy = refs["a_maxy"][p] - oy
            mxz = refs["a_maxz"][p] - oz
            miss_add = refs["a_miss"][p]
            tgt = refs["a_tgt"][p]
            new = []
            for s, st in enumerate(sets):
                t = _slab_t_pre(mnx, mny, mnz, mxx, mxy, mxz,
                                st["ix"], st["iy"], st["iz"]) + miss_add
                occ = t < st["lim"]
                if skips[s] != NO_SKIP:
                    occ = occ & (tgt != skips[s])
                new.append(_match_vma(jnp.where(occ, one, accs[s]),
                                      accs[s]))
            return tuple(new)

        def o_body(p, accs):
            cx, cy, cz = refs["o_cx"][p], refs["o_cy"][p], refs["o_cz"][p]
            hx, hy, hz = refs["o_hx"][p], refs["o_hy"][p], refs["o_hz"][p]
            miss_add = refs["o_miss"][p]
            tgt = refs["o_tgt"][p]
            lox, loy, loz = _mat_rotate(refs, p, ox - cx, oy - cy, oz - cz)
            mnx, mny, mnz = (_neg(hx) - lox, _neg(hy) - loy,
                             _neg(hz) - loz)
            mxx, mxy, mxz = hx - lox, hy - loy, hz - loz
            new = []
            for s, st in enumerate(sets):
                ldx, ldy, ldz = _mat_rotate(refs, p,
                                            st["dx"], st["dy"], st["dz"])
                ix, iy, iz = _inv_dir(ldx, ldy, ldz, ldx)
                t = _slab_t_pre(mnx, mny, mnz, mxx, mxy, mxz, ix, iy, iz) \
                    + miss_add
                occ = t < st["lim"]
                if skips[s] != NO_SKIP:
                    occ = occ & (tgt != skips[s])
                new.append(_match_vma(jnp.where(occ, one, accs[s]),
                                      accs[s]))
            return tuple(new)

        def _raw(k):
            # Cull geometry reads the uncast f32 refs (the cull runs
            # only in the f32 tier — see run_multi_any_hit — so this is
            # belt-and-braces against future keep-set changes).
            r = refs[k]
            return r.raw if hasattr(r, "raw") else r

        def s_culled(p, accs):
            return _maybe(p, accs,
                          (_raw("s_cx")[p], _raw("s_cy")[p],
                           _raw("s_cz")[p], refs["s_br2"][p]),
                          s_body)

        def a_culled(p, accs):
            bcx = (_raw("a_minx")[p] + _raw("a_maxx")[p]) * 0.5
            bcy = (_raw("a_miny")[p] + _raw("a_maxy")[p]) * 0.5
            bcz = (_raw("a_minz")[p] + _raw("a_maxz")[p]) * 0.5
            return _maybe(p, accs, (bcx, bcy, bcz, refs["a_br2"][p]),
                          a_body)

        def o_culled(p, accs):
            return _maybe(p, accs,
                          (_raw("o_cx")[p], _raw("o_cy")[p],
                           _raw("o_cz")[p], refs["o_br2"][p]),
                          o_body)

        accs = tuple(inits)
        if ns:
            accs = jax.lax.fori_loop(0, ns, s_culled, accs)
        if na:
            accs = jax.lax.fori_loop(0, na, a_culled, accs)
        if no:
            accs = jax.lax.fori_loop(0, no, o_culled, accs)
        for out, acc in zip(outs, accs):
            out[...] = acc


def _slab_t_pre(mnx, mny, mnz, mxx, mxy, mxz, ix, iy, iz):
    """Slab hit distance (f32) from precomputed (bound - origin) terms.

    Same select semantics as kernels._slab_t: t = t_near if > 0 else
    t_far, BIG on miss. Products/min-max run in the compute dtype;
    cmp/select in f32."""
    t_near, t_far = _slab_interval_pre(mnx, mny, mnz, mxx, mxy, mxz,
                                       ix, iy, iz)
    miss = (t_near > t_far) | (t_far < 0.0)
    t = jnp.where(t_near > 0.0, t_near, t_far)
    return jnp.where(miss, BIG, t)


def _slab_interval_pre(mnx, mny, mnz, mxx, mxy, mxz, ix, iy, iz):
    """(t_near, t_far) f32 from precomputed (bound - origin) terms;
    products/min-max chains in the compute dtype."""
    t0x, t1x = mnx * ix, mxx * ix
    t0y, t1y = mny * iy, mxy * iy
    t0z, t1z = mnz * iz, mxz * iz
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
    return _f32(t_near), _f32(t_far)


def run_multi_any_hit(prim_fields: dict, counts, o, dirs, limits, skips,
                      init_occ, interpret=False, dtype=jnp.float32,
                      conv_points=None):
    """Fused occlusion over S ray sets sharing one origin.

    o: [R, 3]; dirs: list of S [R, 3] (MUST be normalized — the sphere
    test assumes |d| == 1); limits: [R, S]; skips: static tuple of S
    ints (NO_SKIP = no exclusion); init_occ: [R, S] bool lanes whose
    test is moot (pre-marked occluded, enables block skipping).
    ``dtype``: compute dtype (bf16 = 2x tier; boolean flips possible
    within ~0.4% of geometric edges). ``conv_points``: optional [S, 3]
    per-set ray convergence point (every set-s ray ENDS there: its
    ``limits`` column is the origin->point distance) — enables the
    per-block primitive hull culling (see multi_any_hit_kernel).
    Returns occ [R, S] bool (init_occ lanes come back True).
    """
    R = o.shape[0]
    S = len(dirs)
    rows = _rows(dtype)
    rp = _round_block(R, rows)
    # The hull cull's conservative margin (backend.py CULL_MARGIN) only
    # bounds f32 rounding; the bf16 tier's coordinate/t rounding at demo
    # scales (~0.25+) would defeat it, so the hint is statically ignored
    # there rather than made unsound.
    cull = conv_points is not None and jnp.dtype(dtype) == jnp.float32

    geom = {k: v for k, v in prim_fields.items() if not k.endswith("_dens")}
    ray_names = ["ox", "oy", "oz"]
    rays = [_pad_rays(o[:, 0], rp, dtype), _pad_rays(o[:, 1], rp, dtype),
            _pad_rays(o[:, 2], rp, dtype)]
    for s in range(S):
        ray_names += [f"d{s}x", f"d{s}y", f"d{s}z", f"l{s}"]
        rays += [_pad_rays(dirs[s][:, 0], rp, dtype),
                 _pad_rays(dirs[s][:, 1], rp, dtype),
                 _pad_rays(dirs[s][:, 2], rp, dtype),
                 _pad_rays(limits[:, s], rp)]  # limits stay f32 (cmp domain)
    for s in range(S):
        # Padding lanes enter pre-occluded so fully-padded blocks skip.
        ray_names.append(f"i{s}")
        rays.append(_pad_rays_fill(init_occ[:, s].astype(jnp.float32),
                                   rp, 1.0))

    all_names = ray_names + list(geom.keys())
    kernel = functools.partial(multi_any_hit_kernel, counts, tuple(skips),
                               all_names, dtype, cull)
    extra = []
    if cull:
        extra = [jax.lax.stop_gradient(
            jnp.asarray(conv_points, jnp.float32).reshape(-1))]
    vma = _out_vma(rays, list(geom.values()))
    outs = pl.pallas_call(
        kernel,
        grid=_grid(rp, rows),
        in_specs=([_ray_spec(rows)] * len(rays) + [_prim_spec()] * len(geom)
                  + [_prim_spec()] * len(extra)),
        out_specs=[_ray_spec(rows)] * S,
        out_shape=[_ray_out(rp, jnp.float32, vma)] * S,
        interpret=interpret,
    )(*rays, *geom.values(), *extra)
    return jnp.stack([_unpack_rays(x, R) > 0.5 for x in outs], axis=-1)


# ---------------------------------------------------------------------------
# multi_chord: permeation chord sums over S target ray sets, one stream
# ---------------------------------------------------------------------------


def _sphere_chord_terms(st, ocx, ocy, ocz, cc):
    """Forward chord for one (primitive, set) pair from shared oc terms.

    Half-b quadratic, normalized direction
    (AudioPermeationJobBatched.cs:303-328). Dot product in the compute
    dtype; sqrt/cmp/select in f32. Returns f32 intermediates needed by
    the hand-closed backward."""
    b = _f32(ocx * st["dx"] + ocy * st["dy"] + ocz * st["dz"])
    cc = _f32(cc)
    disc = b * b - cc
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.where(hit, disc, 1.0))
    t_exit = -b + sq
    enter_raw = -b - sq
    chord_raw = t_exit - jnp.maximum(enter_raw, 0.0)
    chord = jnp.maximum(0.0, chord_raw)
    return b, hit, sq, t_exit, enter_raw, chord_raw, chord


def _box_chord_terms(st_ix, st_iy, st_iz, mnx, mny, mnz, mxx, mxy, mxz):
    """Forward chord interval for one (box, set) pair from shared
    (bound - origin) terms. chord = max(0, t_far - max(t_near, 0)).
    Slab core in the compute dtype, chord math in f32."""
    t_near, t_far = _slab_interval_pre(mnx, mny, mnz, mxx, mxy, mxz,
                                       st_ix, st_iy, st_iz)
    chord_raw = t_far - jnp.maximum(t_near, 0.0)
    chord = jnp.maximum(0.0, chord_raw)
    return t_near, t_far, chord_raw, chord


def multi_chord_kernel(counts, skips, names, cdt, *refs_list):
    """Per ray block: S permeation loss accumulators, one primitive stream
    (AudioPermeationJobBatched.cs:225-328 for all targets at once).

    Chord tests run in ``cdt`` (bf16 = 2x tier); the per-ray sums over
    thousands of primitives accumulate in f32 regardless, so reduced
    precision costs per-chord rounding (~0.4% rel) but no accumulation
    drift."""
    ns, na, no = counts
    S = len(skips)
    refs = _cast_refs(dict(zip(names, refs_list[:len(names)])), cdt)
    outs = refs_list[len(names):len(names) + S]

    ox, oy, oz = refs["ox"][...], refs["oy"][...], refs["oz"][...]
    sets = _load_sets(refs, S, with_limits=False)

    accs = tuple(jnp.zeros(ox.shape, jnp.float32) for _ in range(S))

    def acc_add(acc, valid, chord, dens):
        w = jnp.where(valid, chord, 0.0) * dens
        return _match_vma(acc + w.astype(jnp.float32), acc)

    def s_body(p, accs):
        cx, cy, cz = refs["s_cx"][p], refs["s_cy"][p], refs["s_cz"][p]
        r2, tgt, dens = refs["s_r2"][p], refs["s_tgt"][p], refs["s_dens"][p]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        new = []
        for s, st in enumerate(sets):
            _, hit, _, t_exit, _, _, chord = _sphere_chord_terms(
                st, ocx, ocy, ocz, cc)
            valid = hit & (t_exit >= 0.0) & (tgt != skips[s])
            new.append(acc_add(accs[s], valid, chord, dens))
        return tuple(new)

    def a_body(p, accs):
        mnx = refs["a_minx"][p] - ox
        mny = refs["a_miny"][p] - oy
        mnz = refs["a_minz"][p] - oz
        mxx = refs["a_maxx"][p] - ox
        mxy = refs["a_maxy"][p] - oy
        mxz = refs["a_maxz"][p] - oz
        ok = refs["a_miss"][p] == 0.0
        tgt, dens = refs["a_tgt"][p], refs["a_dens"][p]
        new = []
        for s, st in enumerate(sets):
            t_near, t_far, _, chord = _box_chord_terms(
                st["ix"], st["iy"], st["iz"], mnx, mny, mnz, mxx, mxy, mxz)
            valid = ((t_near <= t_far) & (t_far >= 0.0)
                     & (tgt != skips[s]) & ok)
            new.append(acc_add(accs[s], valid, chord, dens))
        return tuple(new)

    def o_body(p, accs):
        cx, cy, cz = refs["o_cx"][p], refs["o_cy"][p], refs["o_cz"][p]
        hx, hy, hz = refs["o_hx"][p], refs["o_hy"][p], refs["o_hz"][p]
        ok = refs["o_miss"][p] == 0.0
        tgt, dens = refs["o_tgt"][p], refs["o_dens"][p]
        lox, loy, loz = _mat_rotate(refs, p, ox - cx, oy - cy, oz - cz)
        mnx, mny, mnz = (_neg(hx) - lox, _neg(hy) - loy, _neg(hz) - loz)
        mxx, mxy, mxz = hx - lox, hy - loy, hz - loz
        new = []
        for s, st in enumerate(sets):
            ldx, ldy, ldz = _mat_rotate(refs, p,
                                        st["dx"], st["dy"], st["dz"])
            ix, iy, iz = _inv_dir(ldx, ldy, ldz, ldx)
            t_near, t_far, _, chord = _box_chord_terms(
                ix, iy, iz, mnx, mny, mnz, mxx, mxy, mxz)
            valid = ((t_near <= t_far) & (t_far >= 0.0)
                     & (tgt != skips[s]) & ok)
            new.append(acc_add(accs[s], valid, chord, dens))
        return tuple(new)

    if ns:
        accs = jax.lax.fori_loop(0, ns, s_body, accs)
    if na:
        accs = jax.lax.fori_loop(0, na, a_body, accs)
    if no:
        accs = jax.lax.fori_loop(0, no, o_body, accs)
    for out, acc in zip(outs, accs):
        out[...] = acc


def run_multi_chord(prim_fields: dict, counts, o, dirs, skips,
                    interpret=False, dtype=jnp.float32):
    """Fused permeation: [R, S] f32 chord-loss sums for S target ray
    sets. ``dtype``: compute dtype for the chord tests (accumulation is
    always f32); dirs must be normalized."""
    R = o.shape[0]
    S = len(dirs)
    rows = _rows(dtype)
    rp = _round_block(R, rows)

    ray_names = ["ox", "oy", "oz"]
    rays = [_pad_rays(o[:, 0], rp, dtype), _pad_rays(o[:, 1], rp, dtype),
            _pad_rays(o[:, 2], rp, dtype)]
    for s in range(S):
        ray_names += [f"d{s}x", f"d{s}y", f"d{s}z"]
        rays += [_pad_rays(dirs[s][:, 0], rp, dtype),
                 _pad_rays(dirs[s][:, 1], rp, dtype),
                 _pad_rays(dirs[s][:, 2], rp, dtype)]

    all_names = ray_names + list(prim_fields.keys())
    kernel = functools.partial(multi_chord_kernel, counts, tuple(skips),
                               all_names, dtype)
    vma = _out_vma(rays, list(prim_fields.values()))
    outs = pl.pallas_call(
        kernel,
        grid=_grid(rp, rows),
        in_specs=([_ray_spec(rows)] * len(rays)
                  + [_prim_spec()] * len(prim_fields)),
        out_specs=[_ray_spec(rows)] * S,
        out_shape=[_ray_out(rp, jnp.float32, vma)] * S,
        interpret=interpret,
    )(*rays, *prim_fields.values())
    return jnp.stack([_unpack_rays(x, R) for x in outs], axis=-1)


# ---------------------------------------------------------------------------
# multi_chord backward: hand-closed adjoints, one primitive stream
# ---------------------------------------------------------------------------
#
# Phase-split density accumulation (round 5, measured on v5e at the 1M x
# 4K x S=4 headline): a cross-lane ``jnp.sum`` *inside* the primitive
# loop stalls Mosaic's software pipeline once per iteration — the AABB
# dens stream ran 137 ms with an in-loop reduce vs 71 ms with none,
# and cutting the reduce COUNT (4 per prim -> 1) bought only ~2%,
# so the stall is per-iteration, not per-reduce. The fix: stage each
# primitive's per-lane density cotangent into a VMEM scratch chunk
# (DENS_CHUNK prims x one (ROWS, RAY_COLS) block each, 1 MB) with no
# reduce in the loop, then reduce the whole chunk in one vectorized
# [CH, R, C] -> [CH] op and accumulate it into a (n/CH, CH) VMEM output
# row. Measured: the phase-split AABB stream matches the no-reduce
# floor exactly (71.8 vs 71.0 ms) at full per-primitive parity.
# Primitive streams are padded to DENS_CHUNK multiples with the same
# guaranteed-miss encodings the backend uses for inactive slots.

DENS_CHUNK = 64  # prims staged per scratch chunk (1 MB f32 scratch)

# Padding fills per field name; anything absent pads with 0. These are
# the backend's own inactive encodings (ops/pallas/backend.py:141-186):
# negative r2 = sphere never hits; inf miss = box invalid; -1 bounding
# r2 = never culled-in by conv-hull tests.
_CHUNK_PAD = {"s_r2": -1e30, "a_miss": float("inf"),
              "o_miss": float("inf"), "s_br2": -1.0, "a_br2": -1.0,
              "o_br2": -1.0}


def _pad_prims_to_chunks(prim_fields, counts, ch=DENS_CHUNK):
    """Pad each primitive type's scalar field arrays to a multiple of
    ``ch`` with guaranteed-miss encodings so the chunked adjoint
    kernels run only full chunks (no tail masking in-kernel). Returns
    (padded_fields, padded_counts)."""
    padded_counts = tuple(-(-n // ch) * ch if n else 0 for n in counts)
    if padded_counts == tuple(counts):
        return prim_fields, tuple(counts)
    per_type = dict(zip("sao", zip(counts, padded_counts)))
    out = {}
    for k, v in prim_fields.items():
        n, np_ = per_type[k[0]]
        if np_ == n:
            out[k] = v
        else:
            fill = _CHUNK_PAD.get(k, 0.0)
            out[k] = jnp.concatenate(
                [v, jnp.full((np_ - n,), fill, v.dtype)])
    return out, padded_counts


def _box_chord_adjoint(gv, dens, t_near, t_far, chord_raw, chord,
                       valid, t0s, t1s, i_s, mn_s, mx_s):
    """Adjoint of the box chord w.r.t. the slab inputs.

    gv: masked cotangent; t0s/t1s/i_s/mn_s/mx_s: per-axis tuples.
    Returns (g_dens_lanes, g_mn per axis, g_mx per axis, g_i per axis).
    Subgradient conventions: first-match axis one-hot for the t_near/t_far
    arg-extrema, t0-on-ties within an axis (measure-zero sets; FD tests
    randomize away from ties)."""
    g_chord = jnp.where(valid, dens, 0.0) * gv * (chord_raw > 0.0)
    g_tfar = g_chord
    g_tnear = -g_chord * (t_near > 0.0)

    tns = [jnp.minimum(t0, t1) for t0, t1 in zip(t0s, t1s)]
    tfs = [jnp.maximum(t0, t1) for t0, t1 in zip(t0s, t1s)]
    # First-match one-hot over axes.
    fx = t_far == tfs[0]
    fy = (t_far == tfs[1]) & ~fx
    fz = ~(fx | fy)
    nx = t_near == tns[0]
    ny = (t_near == tns[1]) & ~nx
    nz = ~(nx | ny)
    f_masks = (fx, fy, fz)
    n_masks = (nx, ny, nz)

    g_mn, g_mx, g_i = [], [], []
    for ax in range(3):
        g_tfa = jnp.where(f_masks[ax], g_tfar, 0.0)
        g_tna = jnp.where(n_masks[ax], g_tnear, 0.0)
        s_a = t0s[ax] <= t1s[ax]  # t0 is the near slab side
        g_t0 = jnp.where(s_a, g_tna, g_tfa)
        g_t1 = jnp.where(s_a, g_tfa, g_tna)
        g_mn.append(g_t0 * i_s[ax])
        g_mx.append(g_t1 * i_s[ax])
        g_i.append(g_t0 * mn_s[ax] + g_t1 * mx_s[ax])
    g_dens_lanes = gv * jnp.where(valid, chord, 0.0)
    return g_dens_lanes, g_mn, g_mx, g_i


def _inv_dir_grad(g_i, d, i):
    """Pull g_i back through i = 1/safe_dir(d): zero in the nudge region."""
    return -g_i * i * i * (jnp.abs(d) >= 1e-12)


def multi_chord_bwd_kernel(counts, skips, names, dens_keys, *refs_list):
    """Hand-closed VJP of multi_chord_kernel.

    Outputs: d_o (3 ray arrays, summed over sets), per-set d_d (3S ray
    arrays), per-type density grads as (n/CH, CH) VMEM chunk grids
    accumulated across the sequential grid; the last ref is the shared
    phase-split VMEM scratch (see the note above DENS_CHUNK — counts
    must be DENS_CHUNK multiples)."""
    ns, na, no = counts
    S = len(skips)
    refs = dict(zip(names, refs_list[:len(names)]))
    outs = refs_list[len(names):-1]
    do_refs = outs[:3 + 3 * S]
    dens_refs = dict(zip(dens_keys, outs[3 + 3 * S:]))
    scratch = refs_list[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dens_refs.values():
            ref[...] = jnp.zeros_like(ref[...])

    ox, oy, oz = refs["ox"][...], refs["oy"][...], refs["oz"][...]
    sets = _load_sets(refs, S, with_limits=False)
    gs = [refs[f"g{s}"][...] for s in range(S)]

    zero = jnp.zeros(ox.shape, jnp.float32)
    # Accumulators: origin grads (shared) + per-set direction grads.
    acc = (zero,) * 3 + tuple(zero for _ in range(3 * S))

    def s_body(p, acc):
        cx, cy, cz = refs["s_cx"][p], refs["s_cy"][p], refs["s_cz"][p]
        r2, tgt, dens = refs["s_r2"][p], refs["s_tgt"][p], refs["s_dens"][p]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        g_ox, g_oy, g_oz = acc[0], acc[1], acc[2]
        new_d = list(acc[3:])
        # Density cotangent: accumulate LANES across sets here; the
        # cross-lane reduction happens OUTSIDE the primitive loop via
        # the phase-split scratch (see _stream / the DENS_CHUNK note).
        # f32 addition-order changes vs the reference accumulation are
        # ~1e-7 rel (within every adjoint parity gate).
        gd_lanes = jnp.zeros(ox.shape, jnp.float32)
        for s, st in enumerate(sets):
            b, hit, sq, t_exit, enter_raw, chord_raw, chord = \
                _sphere_chord_terms(st, ocx, ocy, ocz, cc)
            valid = hit & (t_exit >= 0.0) & (tgt != skips[s])
            gv = jnp.where(valid, gs[s], 0.0)
            gd_lanes = gd_lanes + gv * jnp.where(valid, chord, 0.0)
            g_chord = gv * dens * (chord_raw > 0.0)
            g_texit = g_chord
            g_enter_raw = -g_chord * (enter_raw > 0.0)
            g_b = -g_texit - g_enter_raw
            g_sq = g_texit - g_enter_raw
            g_disc = jnp.where(hit, g_sq * 0.5 / sq, 0.0)
            g_b = g_b + 2.0 * b * g_disc
            g_cc = -g_disc
            # oc = o - c; b = oc . d; cc = |oc|^2 - r2
            g_ox = g_ox + g_b * st["dx"] + 2.0 * ocx * g_cc
            g_oy = g_oy + g_b * st["dy"] + 2.0 * ocy * g_cc
            g_oz = g_oz + g_b * st["dz"] + 2.0 * ocz * g_cc
            new_d[3 * s + 0] = new_d[3 * s + 0] + g_b * ocx
            new_d[3 * s + 1] = new_d[3 * s + 1] + g_b * ocy
            new_d[3 * s + 2] = new_d[3 * s + 2] + g_b * ocz
        return gd_lanes, (g_ox, g_oy, g_oz) + tuple(new_d)

    def a_body(p, acc):
        mn = (refs["a_minx"][p] - ox, refs["a_miny"][p] - oy,
              refs["a_minz"][p] - oz)
        mx = (refs["a_maxx"][p] - ox, refs["a_maxy"][p] - oy,
              refs["a_maxz"][p] - oz)
        ok = refs["a_miss"][p] == 0.0
        tgt, dens = refs["a_tgt"][p], refs["a_dens"][p]
        g_ox, g_oy, g_oz = acc[0], acc[1], acc[2]
        new_d = list(acc[3:])
        gd_lanes = jnp.zeros(ox.shape, jnp.float32)  # reduced in _stream
        for s, st in enumerate(sets):
            i_s = (st["ix"], st["iy"], st["iz"])
            d_s = (st["dx"], st["dy"], st["dz"])
            t0s = tuple(mn[a] * i_s[a] for a in range(3))
            t1s = tuple(mx[a] * i_s[a] for a in range(3))
            t_near, t_far, chord_raw, chord = _box_chord_terms(
                *i_s, *mn, *mx)
            valid = ((t_near <= t_far) & (t_far >= 0.0)
                     & (tgt != skips[s]) & ok)
            gv = jnp.where(valid, gs[s], 0.0)
            g_d_lanes, g_mn, g_mx, g_i = _box_chord_adjoint(
                gv, dens, t_near, t_far, chord_raw, chord, valid,
                t0s, t1s, i_s, mn, mx)
            gd_lanes = gd_lanes + g_d_lanes
            # mn_a = bound - o_a  =>  g_o -= (g_mn + g_mx)
            g_ox = g_ox - (g_mn[0] + g_mx[0])
            g_oy = g_oy - (g_mn[1] + g_mx[1])
            g_oz = g_oz - (g_mn[2] + g_mx[2])
            for a in range(3):
                new_d[3 * s + a] = new_d[3 * s + a] + _inv_dir_grad(
                    g_i[a], d_s[a], i_s[a])
        return gd_lanes, (g_ox, g_oy, g_oz) + tuple(new_d)

    def o_body(p, acc):
        cx, cy, cz = refs["o_cx"][p], refs["o_cy"][p], refs["o_cz"][p]
        hx, hy, hz = refs["o_hx"][p], refs["o_hy"][p], refs["o_hz"][p]
        ok = refs["o_miss"][p] == 0.0
        tgt, dens = refs["o_tgt"][p], refs["o_dens"][p]
        lox, loy, loz = _mat_rotate(refs, p, ox - cx, oy - cy, oz - cz)
        mn = (-hx - lox, -hy - loy, -hz - loz)
        mx = (hx - lox, hy - loy, hz - loz)
        g_lox, g_loy, g_loz = 0.0, 0.0, 0.0
        new_d = list(acc[3:])
        gd_lanes = jnp.zeros(ox.shape, jnp.float32)  # reduced in _stream
        for s, st in enumerate(sets):
            ldx, ldy, ldz = _mat_rotate(refs, p,
                                        st["dx"], st["dy"], st["dz"])
            sdx, sdy, sdz = _safe_dir(ldx), _safe_dir(ldy), _safe_dir(ldz)
            i_s = (1.0 / sdx, 1.0 / sdy, 1.0 / sdz)
            ld_s = (ldx, ldy, ldz)
            t0s = tuple(mn[a] * i_s[a] for a in range(3))
            t1s = tuple(mx[a] * i_s[a] for a in range(3))
            t_near, t_far, chord_raw, chord = _box_chord_terms(
                *i_s, *mn, *mx)
            valid = ((t_near <= t_far) & (t_far >= 0.0)
                     & (tgt != skips[s]) & ok)
            gv = jnp.where(valid, gs[s], 0.0)
            g_d_lanes, g_mn, g_mx, g_i = _box_chord_adjoint(
                gv, dens, t_near, t_far, chord_raw, chord, valid,
                t0s, t1s, i_s, mn, mx)
            gd_lanes = gd_lanes + g_d_lanes
            g_lox = g_lox - (g_mn[0] + g_mx[0])
            g_loy = g_loy - (g_mn[1] + g_mx[1])
            g_loz = g_loz - (g_mn[2] + g_mx[2])
            g_ld = tuple(_inv_dir_grad(g_i[a], ld_s[a], i_s[a])
                         for a in range(3))
            # d_local = M d  =>  g_d = M^T g_ld
            gdx, gdy, gdz = _mat_rotate_t(refs, p, *g_ld)
            new_d[3 * s + 0] = new_d[3 * s + 0] + gdx
            new_d[3 * s + 1] = new_d[3 * s + 1] + gdy
            new_d[3 * s + 2] = new_d[3 * s + 2] + gdz
        # o_local = M (o - c)  =>  g_o = M^T g_lo
        gox, goy, goz = _mat_rotate_t(refs, p, g_lox, g_loy, g_loz)
        return gd_lanes, ((acc[0] + gox, acc[1] + goy, acc[2] + goz)
                          + tuple(new_d))

    def _stream(n, body, out_ref, acc):
        """Phase-split driver: the primitive loop stores lanes (no
        cross-lane reduce inside it); each chunk reduces in one
        vectorized op."""
        def chunk(k, acc):
            def store(c, acc):
                gd, acc = body(k * DENS_CHUNK + c, acc)
                scratch[c] = gd
                return acc
            acc = jax.lax.fori_loop(0, DENS_CHUNK, store, acc)
            red = jnp.sum(jnp.sum(scratch[...], axis=1), axis=1)
            out_ref[k, :] = out_ref[k, :] + red
            return acc
        return jax.lax.fori_loop(0, n // DENS_CHUNK, chunk, acc)

    if ns:
        acc = _stream(ns, s_body, dens_refs["s_dens"], acc)
    if na:
        acc = _stream(na, a_body, dens_refs["a_dens"], acc)
    if no:
        acc = _stream(no, o_body, dens_refs["o_dens"], acc)
    for ref, a in zip(do_refs, acc):
        ref[...] = a


def multi_chord_dens_bwd_kernel(counts, skips, names, dens_keys,
                                *refs_list):
    """Density-only VJP of multi_chord_kernel, phase-split.

    Materials training (the gradient workload's train step) never
    consumes the chord adjoint's ray cotangents — positions are
    material-independent, so d_o / d_dirs are dead outputs there. This
    kernel recomputes the forward chords and accumulates ONLY the
    per-primitive density gradients (sum over lanes of g * chord),
    roughly halving the ops of the full adjoint.

    ``counts`` must be DENS_CHUNK multiples (see _pad_prims_to_chunks);
    outputs are per-type (n/CH, CH) f32 VMEM chunk grids (the wrapper
    reshapes back to [n]); the last ref is the (CH, ROWS, RAY_COLS)
    VMEM scratch that decouples the primitive loop from the cross-lane
    reduction (see the phase-split note above DENS_CHUNK)."""
    ns, na, no = counts
    S = len(skips)
    refs = dict(zip(names, refs_list[:len(names)]))
    dens_refs = dict(zip(dens_keys, refs_list[len(names):-1]))
    scratch = refs_list[-1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dens_refs.values():
            ref[...] = jnp.zeros_like(ref[...])

    ox, oy, oz = refs["ox"][...], refs["oy"][...], refs["oz"][...]
    sets = _load_sets(refs, S, with_limits=False)
    gs = [refs[f"g{s}"][...] for s in range(S)]

    def s_lanes(p):
        cx, cy, cz = refs["s_cx"][p], refs["s_cy"][p], refs["s_cz"][p]
        r2, tgt = refs["s_r2"][p], refs["s_tgt"][p]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        gd_lanes = jnp.zeros(ox.shape, jnp.float32)
        for s, st in enumerate(sets):
            _, hit, _, t_exit, _, _, chord = _sphere_chord_terms(
                st, ocx, ocy, ocz, cc)
            valid = hit & (t_exit >= 0.0) & (tgt != skips[s])
            gd_lanes = gd_lanes + jnp.where(valid, chord, 0.0) * gs[s]
        return gd_lanes

    def a_lanes(p):
        mnx = refs["a_minx"][p] - ox
        mny = refs["a_miny"][p] - oy
        mnz = refs["a_minz"][p] - oz
        mxx = refs["a_maxx"][p] - ox
        mxy = refs["a_maxy"][p] - oy
        mxz = refs["a_maxz"][p] - oz
        ok = refs["a_miss"][p] == 0.0
        tgt = refs["a_tgt"][p]
        gd_lanes = jnp.zeros(ox.shape, jnp.float32)
        for s, st in enumerate(sets):
            t_near, t_far, _, chord = _box_chord_terms(
                st["ix"], st["iy"], st["iz"], mnx, mny, mnz, mxx, mxy, mxz)
            valid = ((t_near <= t_far) & (t_far >= 0.0)
                     & (tgt != skips[s]) & ok)
            gd_lanes = gd_lanes + jnp.where(valid, chord, 0.0) * gs[s]
        return gd_lanes

    def o_lanes(p):
        cx, cy, cz = refs["o_cx"][p], refs["o_cy"][p], refs["o_cz"][p]
        hx, hy, hz = refs["o_hx"][p], refs["o_hy"][p], refs["o_hz"][p]
        ok = refs["o_miss"][p] == 0.0
        tgt = refs["o_tgt"][p]
        lox, loy, loz = _mat_rotate(refs, p, ox - cx, oy - cy, oz - cz)
        mn = (_neg(hx) - lox, _neg(hy) - loy, _neg(hz) - loz)
        mx = (hx - lox, hy - loy, hz - loz)
        gd_lanes = jnp.zeros(ox.shape, jnp.float32)
        for s, st in enumerate(sets):
            ldx, ldy, ldz = _mat_rotate(refs, p,
                                        st["dx"], st["dy"], st["dz"])
            ix, iy, iz = _inv_dir(ldx, ldy, ldz, ldx)
            t_near, t_far, _, chord = _box_chord_terms(
                ix, iy, iz, *mn, *mx)
            valid = ((t_near <= t_far) & (t_far >= 0.0)
                     & (tgt != skips[s]) & ok)
            gd_lanes = gd_lanes + jnp.where(valid, chord, 0.0) * gs[s]
        return gd_lanes

    def _stream(n, lanes, out_ref):
        """Phase 1: store each prim's lanes (no reduce in the loop);
        phase 2: one vectorized [CH, R, C] -> [CH] reduce per chunk."""
        def chunk(k, _):
            def store(c, _):
                scratch[c] = lanes(k * DENS_CHUNK + c)
                return 0
            jax.lax.fori_loop(0, DENS_CHUNK, store, 0)
            red = jnp.sum(jnp.sum(scratch[...], axis=1), axis=1)
            out_ref[k, :] = out_ref[k, :] + red
            return 0
        jax.lax.fori_loop(0, n // DENS_CHUNK, chunk, 0)

    if ns:
        _stream(ns, s_lanes, dens_refs["s_dens"])
    if na:
        _stream(na, a_lanes, dens_refs["a_dens"])
    if no:
        _stream(no, o_lanes, dens_refs["o_dens"])


def _dens_chunk_outs(dens_keys, counts_p, vma):
    """(out_specs, out_shapes) for per-type (n/CH, CH) VMEM chunk grids."""
    per_type = dict(zip("sao", counts_p))
    specs, shapes = [], []
    for k in dens_keys:
        nck = per_type[k[0]] // DENS_CHUNK
        specs.append(pl.BlockSpec((nck, DENS_CHUNK), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
        shapes.append(jax.ShapeDtypeStruct((nck, DENS_CHUNK), jnp.float32,
                                           vma=vma))
    return specs, shapes


def _unpack_dens_chunks(dens_keys, outs, counts):
    """(n/CH, CH) chunk grids -> [n_type] grads at the UNPADDED counts."""
    per_type = dict(zip("sao", counts))
    return {k: out.reshape(-1)[:per_type[k[0]]]
            for k, out in zip(dens_keys, outs)}


def run_multi_chord_dens_bwd(prim_fields: dict, counts, o, dirs, skips,
                             gbar, interpret=False):
    """Density-only adjoint: {dens_key: [P_type] grads}. gbar: [R, S]."""
    R = o.shape[0]
    S = len(dirs)
    rp = _round_block(R)
    prim_fields, counts_p = _pad_prims_to_chunks(prim_fields, counts)
    names = list(prim_fields.keys())
    dens_keys = [k for k in names if k.endswith("_dens")]

    ray_names = ["ox", "oy", "oz"]
    rays = [_pad_rays(o[:, 0], rp), _pad_rays(o[:, 1], rp),
            _pad_rays(o[:, 2], rp)]
    for s in range(S):
        ray_names += [f"d{s}x", f"d{s}y", f"d{s}z"]
        rays += [_pad_rays(dirs[s][:, 0], rp), _pad_rays(dirs[s][:, 1], rp),
                 _pad_rays(dirs[s][:, 2], rp)]
    for s in range(S):
        ray_names.append(f"g{s}")
        rays.append(_pad_rays(gbar[:, s], rp))  # zero-padded: contributes 0

    all_names = ray_names + names
    kernel = functools.partial(multi_chord_dens_bwd_kernel, counts_p,
                               tuple(skips), all_names, dens_keys)
    vma = _out_vma(rays, list(prim_fields.values()))
    dens_specs, dens_out = _dens_chunk_outs(dens_keys, counts_p, vma)
    outs = pl.pallas_call(
        kernel,
        grid=_grid(rp),
        in_specs=([_ray_spec()] * len(rays)
                  + [_prim_spec()] * len(prim_fields)),
        out_specs=dens_specs,
        out_shape=dens_out,
        scratch_shapes=[pltpu.VMEM((DENS_CHUNK, ROWS, RAY_COLS),
                                   jnp.float32)],
        interpret=interpret,
    )(*rays, *prim_fields.values())
    return _unpack_dens_chunks(dens_keys, outs, counts)


def run_multi_chord_bwd(prim_fields: dict, counts, o, dirs, skips, gbar,
                        interpret=False):
    """(d_o [R,3], d_dirs list of S [R,3], {dens_key: [P_type] grads}).

    gbar: [R, S] cotangents of the per-(ray, set) loss."""
    R = o.shape[0]
    S = len(dirs)
    rp = _round_block(R)
    prim_fields, counts_p = _pad_prims_to_chunks(prim_fields, counts)
    names = list(prim_fields.keys())
    dens_keys = [k for k in names if k.endswith("_dens")]

    ray_names = ["ox", "oy", "oz"]
    rays = [_pad_rays(o[:, 0], rp), _pad_rays(o[:, 1], rp),
            _pad_rays(o[:, 2], rp)]
    for s in range(S):
        ray_names += [f"d{s}x", f"d{s}y", f"d{s}z"]
        rays += [_pad_rays(dirs[s][:, 0], rp), _pad_rays(dirs[s][:, 1], rp),
                 _pad_rays(dirs[s][:, 2], rp)]
    for s in range(S):
        ray_names.append(f"g{s}")
        rays.append(_pad_rays(gbar[:, s], rp))  # zero-padded: contributes 0

    all_names = ray_names + names
    kernel = functools.partial(multi_chord_bwd_kernel, counts_p,
                               tuple(skips), all_names, dens_keys)
    vma = _out_vma(rays, list(prim_fields.values()))
    n_ray_outs = 3 + 3 * S
    dens_specs, dens_out = _dens_chunk_outs(dens_keys, counts_p, vma)
    outs = pl.pallas_call(
        kernel,
        grid=_grid(rp),
        in_specs=([_ray_spec()] * len(rays)
                  + [_prim_spec()] * len(prim_fields)),
        out_specs=[_ray_spec()] * n_ray_outs + dens_specs,
        out_shape=[_ray_out(rp, jnp.float32, vma)] * n_ray_outs + dens_out,
        scratch_shapes=[pltpu.VMEM((DENS_CHUNK, ROWS, RAY_COLS),
                                   jnp.float32)],
        interpret=interpret,
    )(*rays, *prim_fields.values())
    d_o = jnp.stack([_unpack_rays(outs[i], R) for i in range(3)], axis=-1)
    d_dirs = [jnp.stack([_unpack_rays(outs[3 + 3 * s + a], R)
                         for a in range(3)], axis=-1) for s in range(S)]
    dens_grads = _unpack_dens_chunks(dens_keys, outs[n_ray_outs:], counts)
    return d_o, d_dirs, dens_grads
