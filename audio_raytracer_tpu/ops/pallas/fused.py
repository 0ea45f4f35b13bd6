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
  a per-ray int32 bitmask (bit s = set s occluded).
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

from audio_raytracer_tpu.ops.pallas.kernels import (
    BIG,
    INT_MAX,
    _grid,
    _out_vma,
    _pad_rays,
    _prim_spec,
    _quat_rotate,
    _ray_out,
    _ray_spec,
    _round_block,
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
    """Load S direction sets (+ limits) and precompute per-set terms."""
    sets = []
    for s in range(n_sets):
        dx = refs[f"d{s}x"][...]
        dy = refs[f"d{s}y"][...]
        dz = refs[f"d{s}z"][...]
        ix = 1.0 / _safe_dir(dx)
        iy = 1.0 / _safe_dir(dy)
        iz = 1.0 / _safe_dir(dz)
        a2 = 2.0 * (dx * dx + dy * dy + dz * dz)
        inv2a = 1.0 / a2
        lim = refs[f"l{s}"][...] if with_limits else None
        sets.append(dict(dx=dx, dy=dy, dz=dz, ix=ix, iy=iy, iz=iz,
                         a2=a2, inv2a=inv2a, lim=lim))
    return sets


# ---------------------------------------------------------------------------
# multi_any_hit: occlusion bitmask over S ray sets, one primitive stream
# ---------------------------------------------------------------------------


def multi_any_hit_kernel(counts, skips, names, *refs_list):
    """Per ray block: occ bitmask (bit s = ray set s occluded).

    ``skips`` is a static tuple of per-set audio-target ids to skip
    (CanRaySeeAudioTarget's AudioTargetId exclusion,
    AudioRaytracerJobBatched.cs:405-449); NO_SKIP for the echo set.
    """
    ns, na, no = counts
    S = len(skips)
    FULL = (1 << S) - 1
    refs = dict(zip(names, refs_list[:len(names)]))
    occ_out = refs_list[len(names)]

    init = refs["init"][...]

    @pl.when(jnp.min(init) == FULL)
    def _done():
        # Whole block pre-resolved (dead / out-of-range lanes): skip the
        # primitive stream.
        occ_out[...] = init

    @pl.when(jnp.min(init) != FULL)
    def _scan():
        ox, oy, oz = refs["ox"][...], refs["oy"][...], refs["oz"][...]
        sets = _load_sets(refs, S, with_limits=True)

        def or_bit(acc, occ, s):
            return acc | occ.astype(jnp.int32) * (1 << s)

        acc0 = init

        def s_body(p, acc):
            cx, cy, cz = refs["s_cx"][p], refs["s_cy"][p], refs["s_cz"][p]
            r2, tgt = refs["s_r2"][p], refs["s_tgt"][p]
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
            for s, st in enumerate(sets):
                b = 2.0 * (ocx * st["dx"] + ocy * st["dy"] + ocz * st["dz"])
                disc = b * b - st["a2"] * 2.0 * cc
                hit = disc >= 0.0
                sq = jnp.sqrt(jnp.where(hit, disc, 1.0))
                t0 = (-b - sq) * st["inv2a"]
                t1 = (-b + sq) * st["inv2a"]
                t = jnp.where(t0 >= 0.0, t0, jnp.where(t1 >= 0.0, t1, BIG))
                t = jnp.where(hit, t, BIG)
                occ = (t < st["lim"]) & (tgt != skips[s])
                acc = or_bit(acc, occ, s)
            return acc

        def a_body(p, acc):
            mnx = refs["a_minx"][p] - ox
            mny = refs["a_miny"][p] - oy
            mnz = refs["a_minz"][p] - oz
            mxx = refs["a_maxx"][p] - ox
            mxy = refs["a_maxy"][p] - oy
            mxz = refs["a_maxz"][p] - oz
            miss_add = refs["a_miss"][p]
            tgt = refs["a_tgt"][p]
            for s, st in enumerate(sets):
                t = _slab_t_pre(mnx, mny, mnz, mxx, mxy, mxz,
                                st["ix"], st["iy"], st["iz"]) + miss_add
                occ = (t < st["lim"]) & (tgt != skips[s])
                acc = or_bit(acc, occ, s)
            return acc

        def o_body(p, acc):
            cx, cy, cz = refs["o_cx"][p], refs["o_cy"][p], refs["o_cz"][p]
            qx, qy, qz = refs["o_qx"][p], refs["o_qy"][p], refs["o_qz"][p]
            qw = refs["o_qw"][p]
            hx, hy, hz = refs["o_hx"][p], refs["o_hy"][p], refs["o_hz"][p]
            miss_add = refs["o_miss"][p]
            tgt = refs["o_tgt"][p]
            lox, loy, loz = _quat_rotate(qx, qy, qz, qw,
                                         ox - cx, oy - cy, oz - cz)
            mnx, mny, mnz = -hx - lox, -hy - loy, -hz - loz
            mxx, mxy, mxz = hx - lox, hy - loy, hz - loz
            for s, st in enumerate(sets):
                ldx, ldy, ldz = _quat_rotate(qx, qy, qz, qw,
                                             st["dx"], st["dy"], st["dz"])
                ix = 1.0 / _safe_dir(ldx)
                iy = 1.0 / _safe_dir(ldy)
                iz = 1.0 / _safe_dir(ldz)
                t = _slab_t_pre(mnx, mny, mnz, mxx, mxy, mxz, ix, iy, iz) \
                    + miss_add
                occ = (t < st["lim"]) & (tgt != skips[s])
                acc = or_bit(acc, occ, s)
            return acc

        acc = acc0
        if ns:
            acc = jax.lax.fori_loop(0, ns, s_body, acc)
        if na:
            acc = jax.lax.fori_loop(0, na, a_body, acc)
        if no:
            acc = jax.lax.fori_loop(0, no, o_body, acc)
        occ_out[...] = acc


def _slab_t_pre(mnx, mny, mnz, mxx, mxy, mxz, ix, iy, iz):
    """Slab hit distance from precomputed (bound - origin) terms.

    Same select semantics as kernels._slab_t: t = t_near if > 0 else
    t_far, BIG on miss."""
    t0x, t1x = mnx * ix, mxx * ix
    t0y, t1y = mny * iy, mxy * iy
    t0z, t1z = mnz * iz, mxz * iz
    tnx, tfx = jnp.minimum(t0x, t1x), jnp.maximum(t0x, t1x)
    tny, tfy = jnp.minimum(t0y, t1y), jnp.maximum(t0y, t1y)
    tnz, tfz = jnp.minimum(t0z, t1z), jnp.maximum(t0z, t1z)
    t_near = jnp.maximum(jnp.maximum(tnx, tny), tnz)
    t_far = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
    miss = (t_near > t_far) | (t_far < 0.0)
    t = jnp.where(t_near > 0.0, t_near, t_far)
    return jnp.where(miss, BIG, t)


def _slab_interval_pre(mnx, mny, mnz, mxx, mxy, mxz, ix, iy, iz):
    """(t_near, t_far) from precomputed (bound - origin) terms."""
    t0x, t1x = mnx * ix, mxx * ix
    t0y, t1y = mny * iy, mxy * iy
    t0z, t1z = mnz * iz, mxz * iz
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
    return t_near, t_far


def run_multi_any_hit(prim_fields: dict, counts, o, dirs, limits, skips,
                      init_occ, interpret=False):
    """Fused occlusion over S ray sets sharing one origin.

    o: [R, 3]; dirs: list of S [R, 3]; limits: [R, S]; skips: static
    tuple of S ints (NO_SKIP = no exclusion); init_occ: [R, S] bool lanes
    whose test is moot (pre-marked occluded, enables block skipping).
    Returns occ [R, S] bool (init_occ lanes come back True).
    """
    R = o.shape[0]
    S = len(dirs)
    rp = _round_block(R)
    FULL = (1 << S) - 1

    geom = {k: v for k, v in prim_fields.items() if not k.endswith("_dens")}
    ray_names = ["ox", "oy", "oz"]
    rays = [_pad_rays(o[:, 0], rp), _pad_rays(o[:, 1], rp),
            _pad_rays(o[:, 2], rp)]
    for s in range(S):
        ray_names += [f"d{s}x", f"d{s}y", f"d{s}z", f"l{s}"]
        rays += [_pad_rays(dirs[s][:, 0], rp), _pad_rays(dirs[s][:, 1], rp),
                 _pad_rays(dirs[s][:, 2], rp), _pad_rays(limits[:, s], rp)]
    bits = jnp.zeros((R,), jnp.int32)
    for s in range(S):
        bits = bits | init_occ[:, s].astype(jnp.int32) * (1 << s)
    ray_names.append("init")
    rays.append(_pad_rays_fill(bits, rp, FULL))

    all_names = ray_names + list(geom.keys())
    kernel = functools.partial(multi_any_hit_kernel, counts, tuple(skips),
                               all_names)
    vma = _out_vma(rays, list(geom.values()))
    occ = pl.pallas_call(
        kernel,
        grid=_grid(rp),
        in_specs=[_ray_spec()] * len(rays) + [_prim_spec()] * len(geom),
        out_specs=_ray_spec(),
        out_shape=_ray_out(rp, jnp.int32, vma),
        interpret=interpret,
    )(*rays, *geom.values())
    bits = _unpack_rays(occ, R)
    return jnp.stack([(bits & (1 << s)) > 0 for s in range(S)], axis=-1)


# ---------------------------------------------------------------------------
# multi_chord: permeation chord sums over S target ray sets, one stream
# ---------------------------------------------------------------------------


def _sphere_chord_terms(st, ocx, ocy, ocz, cc):
    """Forward chord for one (primitive, set) pair from shared oc terms.

    Half-b quadratic, normalized direction
    (AudioPermeationJobBatched.cs:303-328). Returns intermediates needed
    by the hand-closed backward."""
    b = ocx * st["dx"] + ocy * st["dy"] + ocz * st["dz"]
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
    (bound - origin) terms. chord = max(0, t_far - max(t_near, 0))."""
    t_near, t_far = _slab_interval_pre(mnx, mny, mnz, mxx, mxy, mxz,
                                       st_ix, st_iy, st_iz)
    chord_raw = t_far - jnp.maximum(t_near, 0.0)
    chord = jnp.maximum(0.0, chord_raw)
    return t_near, t_far, chord_raw, chord


def multi_chord_kernel(counts, skips, names, *refs_list):
    """Per ray block: S permeation loss accumulators, one primitive stream
    (AudioPermeationJobBatched.cs:225-328 for all targets at once)."""
    ns, na, no = counts
    S = len(skips)
    refs = dict(zip(names, refs_list[:len(names)]))
    outs = refs_list[len(names):len(names) + S]

    ox, oy, oz = refs["ox"][...], refs["oy"][...], refs["oz"][...]
    sets = _load_sets(refs, S, with_limits=False)

    accs = tuple(jnp.zeros(ox.shape, jnp.float32) for _ in range(S))

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
            new.append(accs[s] + jnp.where(valid, chord, 0.0) * dens)
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
            new.append(accs[s] + jnp.where(valid, chord, 0.0) * dens)
        return tuple(new)

    def o_body(p, accs):
        cx, cy, cz = refs["o_cx"][p], refs["o_cy"][p], refs["o_cz"][p]
        qx, qy, qz = refs["o_qx"][p], refs["o_qy"][p], refs["o_qz"][p]
        qw = refs["o_qw"][p]
        hx, hy, hz = refs["o_hx"][p], refs["o_hy"][p], refs["o_hz"][p]
        ok = refs["o_miss"][p] == 0.0
        tgt, dens = refs["o_tgt"][p], refs["o_dens"][p]
        lox, loy, loz = _quat_rotate(qx, qy, qz, qw,
                                     ox - cx, oy - cy, oz - cz)
        mnx, mny, mnz = -hx - lox, -hy - loy, -hz - loz
        mxx, mxy, mxz = hx - lox, hy - loy, hz - loz
        new = []
        for s, st in enumerate(sets):
            ldx, ldy, ldz = _quat_rotate(qx, qy, qz, qw,
                                         st["dx"], st["dy"], st["dz"])
            ix = 1.0 / _safe_dir(ldx)
            iy = 1.0 / _safe_dir(ldy)
            iz = 1.0 / _safe_dir(ldz)
            t_near, t_far, _, chord = _box_chord_terms(
                ix, iy, iz, mnx, mny, mnz, mxx, mxy, mxz)
            valid = ((t_near <= t_far) & (t_far >= 0.0)
                     & (tgt != skips[s]) & ok)
            new.append(accs[s] + jnp.where(valid, chord, 0.0) * dens)
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
                    interpret=False):
    """Fused permeation: [R, S] chord-loss sums for S target ray sets."""
    R = o.shape[0]
    S = len(dirs)
    rp = _round_block(R)

    ray_names = ["ox", "oy", "oz"]
    rays = [_pad_rays(o[:, 0], rp), _pad_rays(o[:, 1], rp),
            _pad_rays(o[:, 2], rp)]
    for s in range(S):
        ray_names += [f"d{s}x", f"d{s}y", f"d{s}z"]
        rays += [_pad_rays(dirs[s][:, 0], rp), _pad_rays(dirs[s][:, 1], rp),
                 _pad_rays(dirs[s][:, 2], rp)]

    all_names = ray_names + list(prim_fields.keys())
    kernel = functools.partial(multi_chord_kernel, counts, tuple(skips),
                               all_names)
    vma = _out_vma(rays, list(prim_fields.values()))
    outs = pl.pallas_call(
        kernel,
        grid=_grid(rp),
        in_specs=([_ray_spec()] * len(rays)
                  + [_prim_spec()] * len(prim_fields)),
        out_specs=[_ray_spec()] * S,
        out_shape=[_ray_out(rp, jnp.float32, vma)] * S,
        interpret=interpret,
    )(*rays, *prim_fields.values())
    return jnp.stack([_unpack_rays(x, R) for x in outs], axis=-1)


# ---------------------------------------------------------------------------
# multi_chord backward: hand-closed adjoints, one primitive stream
# ---------------------------------------------------------------------------


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
    arrays), per-type density grads (SMEM, accumulated across the
    sequential grid)."""
    ns, na, no = counts
    S = len(skips)
    refs = dict(zip(names, refs_list[:len(names)]))
    outs = refs_list[len(names):]
    do_refs = outs[:3 + 3 * S]
    dens_refs = dict(zip(dens_keys, outs[3 + 3 * S:]))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dens_refs.values():
            def zero(i, _):
                ref[i] = 0.0
                return 0
            jax.lax.fori_loop(0, ref.shape[0], zero, 0)

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
        g_dens = 0.0
        for s, st in enumerate(sets):
            b, hit, sq, t_exit, enter_raw, chord_raw, chord = \
                _sphere_chord_terms(st, ocx, ocy, ocz, cc)
            valid = hit & (t_exit >= 0.0) & (tgt != skips[s])
            gv = jnp.where(valid, gs[s], 0.0)
            g_dens = g_dens + jnp.sum(gv * jnp.where(valid, chord, 0.0))
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
        dens_refs["s_dens"][p] += g_dens
        return (g_ox, g_oy, g_oz) + tuple(new_d)

    def a_body(p, acc):
        mn = (refs["a_minx"][p] - ox, refs["a_miny"][p] - oy,
              refs["a_minz"][p] - oz)
        mx = (refs["a_maxx"][p] - ox, refs["a_maxy"][p] - oy,
              refs["a_maxz"][p] - oz)
        ok = refs["a_miss"][p] == 0.0
        tgt, dens = refs["a_tgt"][p], refs["a_dens"][p]
        g_ox, g_oy, g_oz = acc[0], acc[1], acc[2]
        new_d = list(acc[3:])
        g_dens = 0.0
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
            g_dens = g_dens + jnp.sum(g_d_lanes)
            # mn_a = bound - o_a  =>  g_o -= (g_mn + g_mx)
            g_ox = g_ox - (g_mn[0] + g_mx[0])
            g_oy = g_oy - (g_mn[1] + g_mx[1])
            g_oz = g_oz - (g_mn[2] + g_mx[2])
            for a in range(3):
                new_d[3 * s + a] = new_d[3 * s + a] + _inv_dir_grad(
                    g_i[a], d_s[a], i_s[a])
        dens_refs["a_dens"][p] += g_dens
        return (g_ox, g_oy, g_oz) + tuple(new_d)

    def o_body(p, acc):
        cx, cy, cz = refs["o_cx"][p], refs["o_cy"][p], refs["o_cz"][p]
        qx, qy, qz = refs["o_qx"][p], refs["o_qy"][p], refs["o_qz"][p]
        qw = refs["o_qw"][p]
        hx, hy, hz = refs["o_hx"][p], refs["o_hy"][p], refs["o_hz"][p]
        ok = refs["o_miss"][p] == 0.0
        tgt, dens = refs["o_tgt"][p], refs["o_dens"][p]
        lox, loy, loz = _quat_rotate(qx, qy, qz, qw,
                                     ox - cx, oy - cy, oz - cz)
        mn = (-hx - lox, -hy - loy, -hz - loz)
        mx = (hx - lox, hy - loy, hz - loz)
        g_lox, g_loy, g_loz = 0.0, 0.0, 0.0
        new_d = list(acc[3:])
        g_dens = 0.0
        for s, st in enumerate(sets):
            ldx, ldy, ldz = _quat_rotate(qx, qy, qz, qw,
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
            g_dens = g_dens + jnp.sum(g_d_lanes)
            g_lox = g_lox - (g_mn[0] + g_mx[0])
            g_loy = g_loy - (g_mn[1] + g_mx[1])
            g_loz = g_loz - (g_mn[2] + g_mx[2])
            g_ld = tuple(_inv_dir_grad(g_i[a], ld_s[a], i_s[a])
                         for a in range(3))
            # d_local = R(q) d  =>  g_d = R(q)^T g_ld = R(conj q) g_ld
            gdx, gdy, gdz = _quat_rotate(-qx, -qy, -qz, qw, *g_ld)
            new_d[3 * s + 0] = new_d[3 * s + 0] + gdx
            new_d[3 * s + 1] = new_d[3 * s + 1] + gdy
            new_d[3 * s + 2] = new_d[3 * s + 2] + gdz
        dens_refs["o_dens"][p] += g_dens
        # o_local = R(q)(o - c)  =>  g_o = R(conj q) g_lo
        gox, goy, goz = _quat_rotate(-qx, -qy, -qz, qw, g_lox, g_loy, g_loz)
        return (acc[0] + gox, acc[1] + goy, acc[2] + goz) + tuple(new_d)

    if ns:
        acc = jax.lax.fori_loop(0, ns, s_body, acc)
    if na:
        acc = jax.lax.fori_loop(0, na, a_body, acc)
    if no:
        acc = jax.lax.fori_loop(0, no, o_body, acc)
    for ref, a in zip(do_refs, acc):
        ref[...] = a


def run_multi_chord_bwd(prim_fields: dict, counts, o, dirs, skips, gbar,
                        interpret=False):
    """(d_o [R,3], d_dirs list of S [R,3], {dens_key: [P_type] grads}).

    gbar: [R, S] cotangents of the per-(ray, set) loss."""
    R = o.shape[0]
    S = len(dirs)
    rp = _round_block(R)
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
    kernel = functools.partial(multi_chord_bwd_kernel, counts, tuple(skips),
                               all_names, dens_keys)
    vma = _out_vma(rays, list(prim_fields.values()))
    n_ray_outs = 3 + 3 * S
    dens_out = [jax.ShapeDtypeStruct(prim_fields[k].shape, jnp.float32,
                                     vma=vma)
                for k in dens_keys]
    outs = pl.pallas_call(
        kernel,
        grid=_grid(rp),
        in_specs=([_ray_spec()] * len(rays)
                  + [_prim_spec()] * len(prim_fields)),
        out_specs=[_ray_spec()] * n_ray_outs + [_prim_spec()] * len(dens_keys),
        out_shape=[_ray_out(rp, jnp.float32, vma)] * n_ray_outs + dens_out,
        interpret=interpret,
    )(*rays, *prim_fields.values())
    d_o = jnp.stack([_unpack_rays(outs[i], R) for i in range(3)], axis=-1)
    d_dirs = [jnp.stack([_unpack_rays(outs[3 + 3 * s + a], R)
                         for a in range(3)], axis=-1) for s in range(S)]
    dens_grads = dict(zip(dens_keys, outs[n_ray_outs:]))
    return d_o, d_dirs, dens_grads
