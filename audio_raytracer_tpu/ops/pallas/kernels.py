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

Performance notes (measured on v5e at the 1M x 4K x 4-target headline;
round-3 state ~1123 ms fwd = 934k rays/s, kernels ~=91% of step time):

- Divisions were ~15-20% of the OBB paths (3 per (prim, set)); replaced
  by the approximate-reciprocal + one-Newton-step _fast_recip (~f32
  exact, 395 -> 305 ms on an all-OBB occlusion stream).
- The per-set test math is near its intrinsic op-count minimum; the
  kernels run register-pressure-limited, NOT ILP-starved: manually
  unrolling the primitive loop 2x REGRESSED 1.9x (spills), and 16-row
  f32 blocks regressed ~5% for the same reason. Don't re-try those.
- Splitting the 5-set fused occlusion into smaller set groups loses:
  the shared per-prim terms get recomputed (S=3 + S=2 costs ~10% more
  than S=5 in one stream).
- Aliveness: fully-dead ray blocks skip the primitive stream (the
  ``av`` input below + the fused kernels' init bits). With the default
  long-ray-life workload the alive fraction stays >= 0.74 through the
  last bounce, so the explicit alive-first compaction
  (ops/trace.alive_partition) is ~net-neutral there (its two packed
  permutation gathers cost ~14 ms/bounce — and must be GATHERS: a
  scatter-based restore cost ~67 ms/bounce, TPU scatter serializes).
  At the reference's own maxRayLife=125 budget rays die fast and
  compaction is ~10% end-to-end (1122 -> 1012 ms). Round 4's
  compact_unordered tier (ops/trace.py) halves the reorder cost by
  skipping the inverse-permutation restore entirely — every non-debug
  consumer is a permutation-invariant reduction — landing 955 ms at
  125-life (1.10M rays/s) and flipping compaction to +6% even at
  300-life (1133 -> 1066 ms). Do NOT reduce the in-loop muffle counts
  with segment_sum: the [R]->[B] scatter-add serializes on TPU
  (~9 ms/bounce measured); use a plain sum (B=1) or one-hot matmul.
- Chord adjoints, phase-split density accumulation (round 5): a
  cross-lane ``jnp.sum`` INSIDE the primitive loop stalls Mosaic's
  software pipeline once per iteration — per-iteration, not
  per-reduce (cutting 4 reduces/prim to 1 by lane-reassociation
  bought ~2%; removing the reduce entirely halved the stream: AABB
  dens stream 137 -> 71 ms). Both adjoint kernels therefore stage
  each primitive's per-lane density cotangent into a VMEM scratch
  chunk (fused.DENS_CHUNK = 64 prims x one block, 1 MB) and reduce
  per chunk in one vectorized op. Measured at the headline (device
  times net of the ~30 ms dispatch round trip): density-only adjoint
  299 -> 160 ms — now EQUAL to the chord forward, i.e. the reduction
  is free; full pose-grad adjoint 579 -> 470 ms. Step-level: fwd_bwd
  1563 -> 1417 ms (740k rays/s), posegrads 1871 -> 1737 ms.
- Full pose-grad chord adjoint (fused.run_multi_chord_bwd), measured
  decomposition of the posegrads step at the headline (pre-phase-split
  round-4 numbers in parens): 783 ms in-loop occlusion kernels + 236
  closest-hit + 440 (548) chord adjoint + 133 chord forward
  (linearization) + ~100 XLA fusions. The remaining adjoint-vs-dens
  gap (440 vs 160) is the 3+3S ray-cotangent accumulator arrays (15
  at S=4, ~60 vregs in (8,512) blocks) pushing past the register file
  — marginal per-set cost measured superlinear (set 2: +76 ms; sets
  3-4: +125 ms/set) — but SPLITTING loses outright because each split
  kernel re-pays the ~150 ms base primitive stream: 4 x S=1 kernels
  ~888 ms, 2 x S=2 ~596 ms, vs the fused adjoint. Don't re-try the
  split.
  Also measured: the fwd+bwd step is RAY-LIFE-INDEPENDENT (1568 ms at
  maxRayLife 300 vs 1569 at 125) — the life-independent chord forward
  + adjoint + linearization dominate, so the early-death work savings
  that buy 10%+ on inference do not transfer to training.
- Per-primitive culling via lax.cond is a NET LOSS: the fused occlusion
  kernels support a sound convergence-hull cull (every ray set ends at
  one point, so a scalar AABB(block-origin-box u point) test can skip a
  primitive's whole vector body — run_multi_any_hit(conv_points=...)),
  and offline analysis showed 47%/16% joint cull rates at bounces 0/1
  of the headline scene. But a branch in the primitive loop stops
  Mosaic from prefetching the next iteration's scalar loads past it,
  un-hiding them from the VPU stream: +38% on the occlusion kernel
  even when nothing culls, vs ~13% average work removed. Group-level
  conds would need Morton-ordered primitive copies and still net out
  ~zero at demo densities. The API stays (parity-tested) for sparse
  /clustered scenes; the trace loop does not use it. Permeation chords
  cannot cull at all: the reference integrates along the UNBOUNDED ray
  (AudioPermeationJobBatched.cs:287 has no upper t limit), and the
  infinite sweep reaches ~98% of primitives.
- Occlusion-only lane compaction in the TRAINING path is MEASURED
  -NEGATIVE (round 5, don't retry): the occlusion booleans carry no
  tangents, so loudness_map could legally compact the occlusion
  KERNEL's inputs under stop_gradient (gather in, inverse-GATHER the
  booleans out — no transposed scatter ever materializes) while the
  gradient-carrying trace lanes stay uncompacted. Measured at the 1M
  x 4K headline: 1557 -> 1761 ms at maxRayLife 300 and 1557 -> 1680
  at 125 (grads identical). Unlike the inference tier's carry
  compaction, the training variant must re-pack ~28 columns (offset
  point + 5 direction sets + limits + moot bits) from scratch EVERY
  bounce and pays both permutation gathers per bounce — ~40 ms/bounce
  of data movement against <= 31 ms/bounce of skippable occlusion
  work even at the fast-death ray budget.
- Host-side per-bounce primitive compaction (build a compacted prim
  list with XLA gathers, stream only that) is ANALYZED-NEGATIVE, by
  structure not implementation: the 47%/16% bounce-0/1 cull rates are
  PER-RAY-BLOCK hull rates — a single compacted list shared by the
  whole grid must keep any primitive inside the union of all 256
  block hulls x 5 sets, which at demo densities is ~the whole scene
  (measured on the headline scene: 0.2% global cull at bounce 0,
  0.0% at bounces 1-4).
  Per-block lists would cull, but the kernel would then need indirect
  SMEM scalar loads (prim = fields[list[i]]), the same decoupled
  -prefetch stall class as the measured +38% lax.cond, plus a
  [256-block x P x 5-set] hull-test build per bounce that costs about
  what it saves. The work-avoidance lever that DOES pay on this
  hardware is the ray axis (aliveness blocks + unordered compaction),
  not the primitive axis.

Reduced precision (``compute_dtype="bfloat16"``): kernels run geometry
arithmetic in bf16 (16, 512) blocks with f32 islands for every cmp /
select / sqrt / division (Mosaic on this platform rejects those ops in
bf16, as well as bf16 scalar negation — see _f32/_neg). Measured on a
v5e at 1M rays x 4K prims the bf16 tier is NET SLOWER than f32 (~1.9 s
vs ~1.4 s/step): the cmp/select-heavy occlusion tests spend most ops in
the f32 islands while 16-row blocks double register pressure. It also
degrades secondary-ray semantics at world scales >> 1 (the reference's
1e-4 epsilon hit-point offset, AudioRaytracerJobBatched.cs:57, is below
bf16 resolution at ~100 m coordinates, so echo/muffle rays can
self-occlude on the surface they just left — the reference only ever
stores *collider* data in half, ColliderAABBStruct.cs:10-11, and keeps
ray math in float). f32 is therefore the recommended and default tier;
bf16 remains available, parity-tested at documented tolerances
(tests/test_bf16.py), for small-scene / coarse-audio use — set
``TraceConfig.epsilon >= world_scale * 2**-8`` so the hit-point offset
survives bf16 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_COLS = 512
ROWS = 8
RAY_BLOCK = ROWS * RAY_COLS  # rays per grid step (f32 tier)
# Python literals (not jnp constants): the kernel must not capture arrays.
INT_MAX = 2**31 - 1
BIG = 3.0e38
# SMEM budget for primitive fields (conservative; probe showed >= 512 KB).
SMEM_BYTES = 512 * 1024


def _rows(dtype):
    """Sublane rows per ray block: bf16 vregs pack (16, 128) lanes vs
    f32's (8, 128), so the bf16 tier stages 16-row blocks — 2x rays per
    VPU op, the measured 2x VPU throughput on v5e. This is the TPU
    analog of the reference's half-precision layout
    (ColliderAABBStruct.cs:10-11, halfQuaternion.cs)."""
    return 16 if dtype == jnp.bfloat16 else ROWS


def _f32(x):
    """Upcast bf16 to f32 (identity on f32): the boundary of an "f32
    island". Mosaic on this platform supports bf16 *arithmetic* (2x VPU
    throughput) but not bf16 comparisons, selects, sqrt, or division —
    the mixed-precision kernels keep the op-heavy geometry arithmetic
    (slab products, min/max chains, rotations, dot products) in bf16 and
    route every cmp/select/sqrt/div through f32."""
    return x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x


class _CastRef:
    """Ref wrapper casting f32 loads to the kernel compute dtype.

    SMEM primitive fields stay f32 (full-precision geometry, scalar-core
    casts are free alongside the VPU stream); ray blocks arrive already
    in the compute dtype and pass through untouched."""

    def __init__(self, ref, cdt):
        self._ref, self._cdt = ref, cdt

    @property
    def raw(self):
        """The underlying uncast (f32) ref, for consumers that must not
        see the compute-dtype rounding (e.g. cull geometry)."""
        return self._ref

    def __getitem__(self, idx):
        v = self._ref[idx]
        return v.astype(self._cdt) if v.dtype == jnp.float32 else v


def _cast_refs(refs: dict, cdt, keep=()) -> dict:
    """Wrap refs so loads come back in ``cdt``; ``keep`` names stay raw
    (f32 limit / accumulator-init blocks in the mixed tier). Fields in
    the cmp/accumulate domain (miss encodings, densities) always stay
    f32 — only geometry entering the bf16 arithmetic is cast."""
    if cdt == jnp.float32:
        return refs
    return {k: (r if k in keep or k.endswith(("_miss", "_dens", "_br2"))
                else _CastRef(r, cdt))
            for k, r in refs.items()}


def _safe_dir(d):
    # Zero-axis nudge, mirroring ops/intersect._aabb_slab. ones_like
    # keeps the op in d's compute dtype (f32 or bf16).
    nudge = jnp.where(d >= 0, jnp.ones_like(d), -jnp.ones_like(d)) * 1e-12
    return jnp.where(jnp.abs(d) < 1e-12, nudge, d)


# ---------------------------------------------------------------------------
# Per-primitive tests (one scalar primitive vs an (8, RAY_COLS) ray block)
# ---------------------------------------------------------------------------


def _sphere_t(refs, p, ox, oy, oz, dx, dy, dz, a2, inv2a):
    """Sphere p hit distance over the ray block; BIG = miss (f32).

    Full quadratic with a = dot(d, d), near root preferred
    (AudioRaytracerJobBatched.cs:323-355). a2 = 2a, inv2a = 1/(2a)
    (f32). Dot products run in the compute dtype; discriminant, sqrt
    and root selection in f32 (see _f32).
    """
    cx, cy, cz = refs["s_cx"][p], refs["s_cy"][p], refs["s_cz"][p]
    r2 = refs["s_r2"][p]
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    b = _f32(2.0 * (ocx * dx + ocy * dy + ocz * dz))
    cc = _f32(ocx * ocx + ocy * ocy + ocz * ocz) - _f32(r2)
    disc = b * b - a2 * 2.0 * cc
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.where(hit, disc, 1.0))
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    t = jnp.where(t0 >= 0.0, t0, jnp.where(t1 >= 0.0, t1, BIG))
    return jnp.where(hit, t, BIG)


def _slab_t(minx, miny, minz, maxx, maxy, maxz, ox, oy, oz, ix, iy, iz):
    """Slab test (scalar bounds vs ray-block vectors). Returns
    (t, t_near, t_far, miss) in f32: t per reference select (tNear if
    > 0 else tFar), miss when tNear > tFar or tFar < 0. Products and
    min/max chains run in the inputs' compute dtype."""
    t0x, t1x = (minx - ox) * ix, (maxx - ox) * ix
    t0y, t1y = (miny - oy) * iy, (maxy - oy) * iy
    t0z, t1z = (minz - oz) * iz, (maxz - oz) * iz
    tnx, tfx = jnp.minimum(t0x, t1x), jnp.maximum(t0x, t1x)
    tny, tfy = jnp.minimum(t0y, t1y), jnp.maximum(t0y, t1y)
    tnz, tfz = jnp.minimum(t0z, t1z), jnp.maximum(t0z, t1z)
    t_near = _f32(jnp.maximum(jnp.maximum(tnx, tny), tnz))
    t_far = _f32(jnp.minimum(jnp.minimum(tfx, tfy), tfz))
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


def _mat_rotate(refs, p, vx, vy, vz):
    """Rotate block vectors into OBB p's local frame by the baked
    world->local rotation-matrix rows (9 SMEM scalars, from
    quaternion.to_matrix of the pre-inverted quaternion): 15 fused
    mul/adds per vector vs ~27 for the quaternion sandwich."""
    rx = (refs["o_m00"][p] * vx + refs["o_m01"][p] * vy
          + refs["o_m02"][p] * vz)
    ry = (refs["o_m10"][p] * vx + refs["o_m11"][p] * vy
          + refs["o_m12"][p] * vz)
    rz = (refs["o_m20"][p] * vx + refs["o_m21"][p] * vy
          + refs["o_m22"][p] * vz)
    return rx, ry, rz


def _mat_rotate_t(refs, p, vx, vy, vz):
    """Transpose (local -> world) rotate: M^T v, for backward passes."""
    rx = (refs["o_m00"][p] * vx + refs["o_m10"][p] * vy
          + refs["o_m20"][p] * vz)
    ry = (refs["o_m01"][p] * vx + refs["o_m11"][p] * vy
          + refs["o_m21"][p] * vz)
    rz = (refs["o_m02"][p] * vx + refs["o_m12"][p] * vy
          + refs["o_m22"][p] * vz)
    return rx, ry, rz


def _obb_local(refs, p, ox, oy, oz, dx, dy, dz):
    """Rotate the ray block into OBB p's local frame. Returns local
    origin and direction."""
    cx, cy, cz = refs["o_cx"][p], refs["o_cy"][p], refs["o_cz"][p]
    lox, loy, loz = _mat_rotate(refs, p, ox - cx, oy - cy, oz - cz)
    ldx, ldy, ldz = _mat_rotate(refs, p, dx, dy, dz)
    return lox, loy, loz, ldx, ldy, ldz


def _match_vma(x, like):
    """Give x the same varying-manual-axes type as ``like``.

    Under a compiled shard_map trace, values derived from grid-invariant
    SMEM refs can come back unvaried while the fori_loop carry entered
    varying over the mesh axes — pvary so carry input/output types
    match (no data movement; a type cast)."""
    want = getattr(jax.typeof(like), "vma", None) or frozenset()
    have = getattr(jax.typeof(x), "vma", None) or frozenset()
    missing = want - have
    if missing:
        return jax.lax.pvary(x, tuple(missing))
    return x


def _neg(x):
    """Negation avoiding Mosaic's unsupported bf16 neg: route scalars
    through f32 (identity cost on f32 inputs)."""
    if x.dtype == jnp.bfloat16:
        return (-x.astype(jnp.float32)).astype(jnp.bfloat16)
    return -x


def _fast_recip(x):
    """~f32-exact reciprocal: VPU approximate-reciprocal seed + one
    Newton-Raphson step (r1 = r0 (2 - x r0), ~1e-7 rel error) — ~3 VPU
    ops vs ~10 for a full divide. The OBB paths issue 3 reciprocals per
    (primitive, ray set); at 4K prims x 5 sets this is ~15% of the
    whole forward step when done with real divisions."""
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def _inv_dir(ldx, ldy, ldz, cdt_of):
    """1 / safe_dir per local axis: f32 island (Mosaic has no bf16
    division), result back in the compute dtype for the slab products."""
    ix = _fast_recip(_safe_dir(_f32(ldx)))
    iy = _fast_recip(_safe_dir(_f32(ldy)))
    iz = _fast_recip(_safe_dir(_f32(ldz)))
    dt = cdt_of.dtype
    return ix.astype(dt), iy.astype(dt), iz.astype(dt)


def _obb_t(refs, p, ox, oy, oz, dx, dy, dz):
    hx, hy, hz = refs["o_hx"][p], refs["o_hy"][p], refs["o_hz"][p]
    lox, loy, loz, ldx, ldy, ldz = _obb_local(refs, p, ox, oy, oz, dx, dy, dz)
    ix, iy, iz = _inv_dir(ldx, ldy, ldz, ox)
    t, _, _, miss = _slab_t(_neg(hx), _neg(hy), _neg(hz), hx, hy, hz,
                            lox, loy, loz, ix, iy, iz)
    return jnp.where(miss, BIG, t) + refs["o_miss"][p]


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _ray_block_inputs(refs):
    ox, oy, oz = refs["ox"][...], refs["oy"][...], refs["oz"][...]
    dx, dy, dz = refs["dx"][...], refs["dy"][...], refs["dz"][...]
    ix, iy, iz = _inv_dir(dx, dy, dz, ox)
    a = _f32(dx * dx + dy * dy + dz * dz)
    return ox, oy, oz, dx, dy, dz, ix, iy, iz, a


def closest_hit_kernel(counts, names, cdt, *refs_list):
    """Grid step: one ray block vs all primitives -> (t_min, winner rank).

    The fori loops below ARE the reference scan (sphere -> AABB -> OBB,
    strict < update: AudioRaytracerJobBatched.cs:225-280) vectorized over
    the ray block. ``cdt`` is the compute dtype (f32, or bf16 for the
    2x-throughput reduced-precision tier).

    ``av`` is a per-lane aliveness block (1.0 = alive): blocks whose
    every lane is dead skip the primitive stream and report all-miss —
    the TPU analog of the reference's per-ray early exit
    (AudioRaytracerJobBatched.cs:104). ops.trace compacts rays by
    aliveness between bounces so dead lanes pool into skippable blocks.
    """
    ns, na, no = counts
    refs = _cast_refs(dict(zip(names, refs_list[:len(names)])), cdt,
                      keep={"av"})
    t_out, win_out = refs_list[len(names)], refs_list[len(names) + 1]

    av = refs["av"][...]  # f32 aliveness (padding lanes arrive dead)
    pre = jnp.max(av)

    # Ray-block loads stay OUTSIDE the skip branches (see fused.py: values
    # loaded inside a pl.when closure lose their varying-manual-axes type
    # under compiled shard_map traces; the block DMA happens per grid step
    # regardless).
    ox, oy, oz, dx, dy, dz, ix, iy, iz, a = _ray_block_inputs(refs)
    a2 = 2.0 * a
    inv2a = 1.0 / a2
    shape = ox.shape

    @pl.when(pre < 0.5)
    def _dead():
        # Whole block dead: all-miss, no primitive stream.
        t_out[...] = _match_vma(jnp.full(shape, BIG, jnp.float32), av)
        win_out[...] = _match_vma(jnp.full(shape, INT_MAX, jnp.int32), av)

    @pl.when(pre >= 0.5)
    def _scan():
        # Per-prim t values come back f32 (cmp/select islands), so the
        # running minimum and its strict-< update stay exact in every
        # tier.
        best_t = _match_vma(jnp.full(shape, BIG, jnp.float32), av)
        best_i = _match_vma(jnp.full(shape, INT_MAX, jnp.int32), av)

        def update(best, t, rank):
            bt, bi = best
            upd = t < bt
            return jnp.where(upd, t, bt), jnp.where(upd, rank, bi)

        if ns:
            def s_body(p, best):
                return update(best,
                              _sphere_t(refs, p, ox, oy, oz, dx, dy, dz,
                                        a2, inv2a), p)
            best = jax.lax.fori_loop(0, ns, s_body, (best_t, best_i))
            best_t, best_i = best
        if na:
            def a_body(p, best):
                return update(best, _aabb_t(refs, p, ox, oy, oz, ix, iy, iz),
                              ns + p)
            best = jax.lax.fori_loop(0, na, a_body, (best_t, best_i))
            best_t, best_i = best
        if no:
            def o_body(p, best):
                return update(best, _obb_t(refs, p, ox, oy, oz, dx, dy, dz),
                              ns + na + p)
            best = jax.lax.fori_loop(0, no, o_body, (best_t, best_i))
            best_t, best_i = best

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


def _ray_spec(rows=ROWS):
    # Ray arrays are (rp/RAY_COLS, RAY_COLS); each grid step stages the
    # band (rows, RAY_COLS) at rows [rows*i, rows*(i+1)).
    return pl.BlockSpec((rows, RAY_COLS), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _round_block(R, rows=ROWS):
    block = rows * RAY_COLS
    return -(-R // block) * block


def _pad_rays(x, rp, dtype=None):
    """[R] -> (rp/RAY_COLS, RAY_COLS) row-major (a free reshape)."""
    r = x.shape[0]
    if dtype is not None:
        x = x.astype(dtype)
    if r != rp:
        x = jnp.concatenate([x, jnp.zeros((rp - r,), x.dtype)])
    return x.reshape(rp // RAY_COLS, RAY_COLS)


def _unpack_rays(x, R):
    """(rp/RAY_COLS, RAY_COLS) -> [R]."""
    return x.reshape(-1)[:R]


def _grid(rp, rows=ROWS):
    return (rp // (rows * RAY_COLS),)


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


def run_closest_hit(prim_fields: dict, counts, o, d, interpret=False,
                    dtype=jnp.float32, alive=None):
    """o, d: [R, 3] -> (t [R] f32 (+inf miss), rank [R] int32).

    ``prim_fields``: dict of 1-D scalar arrays (see PallasBackend);
    ``counts``: true (ns, na, no). ``dtype``: compute dtype (bf16 runs
    ~2x faster; t carries ~8-bit mantissa and near-tie winners may
    differ from the f32 scan). ``alive``: optional [R] bool — blocks
    whose lanes are ALL dead skip the primitive stream and report miss
    (mixed blocks still compute every lane; callers mask dead lanes
    themselves). Pair with ops.trace's aliveness compaction so dead
    lanes pool into fully-skippable blocks.
    """
    R = o.shape[0]
    rows = _rows(dtype)
    rp = _round_block(R, rows)
    names = list(prim_fields.keys())
    geom = [k for k in names
            if not k.endswith("_tgt") and not k.endswith("_dens")]
    fields = {k: prim_fields[k] for k in geom}
    av = (jnp.ones((R,), jnp.float32) if alive is None
          else alive.astype(jnp.float32))
    ray_names = ["ox", "oy", "oz", "dx", "dy", "dz", "av"]
    rays = [_pad_rays(o[:, 0], rp, dtype), _pad_rays(o[:, 1], rp, dtype),
            _pad_rays(o[:, 2], rp, dtype), _pad_rays(d[:, 0], rp, dtype),
            _pad_rays(d[:, 1], rp, dtype), _pad_rays(d[:, 2], rp, dtype),
            _pad_rays(av, rp)]  # zero-padded: padding lanes arrive dead
    # Padded rays have d = 0 -> nudged dirs; results sliced off anyway.

    all_names = ray_names + list(fields.keys())
    kernel = functools.partial(closest_hit_kernel, counts, all_names, dtype)
    vma = _out_vma(rays, list(fields.values()))
    t, win = pl.pallas_call(
        kernel,
        grid=_grid(rp, rows),
        in_specs=[_ray_spec(rows)] * 7 + [_prim_spec()] * len(fields),
        out_specs=[_ray_spec(rows), _ray_spec(rows)],
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
