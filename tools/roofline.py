"""Speed-of-light roofline measurement (BASELINE.md "Speed of light").

Re-derives, on the attached TPU chip, every measured input to the
op-count roofline:

1. **Calibration ceiling**: Pallas kernels of the production shape
   (one (8,512) f32 ray block per grid step, SMEM scalar "primitives"
   streamed by a fori_loop) whose bodies are counted chains of the
   production op mix with 4-way ILP. The marginal rate — slope between
   the 80- and 160-op bodies, which cancels the per-iteration scalar
   -stream overhead — is the empirical primitive-op issue ceiling.
   Counting convention: every JAX-level elementwise op on the block
   (mul/add/cmp/min/max/select/sqrt/recip) = 1 per lane; `a*b+c` = 2.
2. **Participation**: hit_counts histograms of the headline forward at
   maxRayLife 300 and 125 -> per-bounce sweep fractions.
3. **Standalone kernel rates**: the production closest-hit / fused
   occlusion / chord kernels at the headline shape, minus the measured
   trivial-jit dispatch+drain round trip.
4. **The floor table**: counted ops x participation / ceiling, against
   freshly measured step times is printed for comparison with
   BASELINE.md (which quotes the canonical BENCH artifacts).

Run: ``python tools/roofline.py`` (~6 min; needs the TPU device).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_COLS, ROWS = 512, 8
LANES = ROWS * RAY_COLS
R = 1_048_576
P = 4096

# Scene-weighted counted primitive-ops per (ray, prim) pair — the
# static counts derived in BASELINE.md from the kernel bodies.
OPS_CLOSEST = 48.5     # sphere 35 / aabb 32 / obb 95
OPS_OCCL5 = 198.5      # sphere 134 / aabb 139 / obb 382 (S=5)
OPS_CHORD4 = 156.25    # sphere 97 / aabb 110 / obb 308 (S=4)
# Density-only chord adjoint: recomputes the forward chords and swaps
# the forward's (where*dens, acc+) accumulate for (where*g, acc+) — the
# op count per (pair, set) is identical to the forward's; the per-chunk
# phase-split reduction adds ~1/DENS_CHUNK per pair (negligible).
OPS_DENS_BWD4 = 156.25


def _drain(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def _med(fn, arg, iters=5):
    _drain(fn(arg))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        _drain(fn(arg + jnp.float32(i) * 1e-6))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def roundtrip_ms():
    x = jnp.ones((8, 128))
    f = jax.jit(lambda x: jnp.sum(x))
    dt = _med(f, x, iters=9)
    print(f"dispatch+drain round trip: {dt * 1e3:.1f} ms")
    return dt


def calibrate(mix, ops_per_iter, blocks=256, prims=4096, iters=5):
    """Counted-op calibration kernel; returns median seconds."""
    fields = [jnp.linspace(0.9, 1.1, prims).astype(jnp.float32) + 1e-3 * i
              for i in range(6)]
    x = jnp.ones((blocks * ROWS, RAY_COLS), jnp.float32) * 0.5

    def kernel(x_ref, *refs):
        f_refs, o_ref = refs[:6], refs[6]
        v0 = x_ref[...]

        def body(p, carry):
            v1, v2, v3, v4 = carry
            a, b, c = f_refs[0][p], f_refs[1][p], f_refs[2][p]
            d, e, f = f_refs[3][p], f_refs[4][p], f_refs[5][p]
            if mix == "fma4":  # 4 independent chains; each v*s+c = 2 ops
                for i in range(ops_per_iter // 8):
                    s = (a, b, c, d, e, f)[i % 6]
                    v1 = v1 * s + 1e-7
                    v2 = v2 * s + 2e-7
                    v3 = v3 * s + 3e-7
                    v4 = v4 * s + 4e-7
            else:  # occl mix: 11 counted ops per rep, 4-wide ILP
                for i in range(ops_per_iter // 11):
                    s = (a, b, c)[i % 3]
                    t = (d, e, f)[i % 3]
                    v1 = v1 * s + 1e-7            # 2
                    v2 = v2 + t * 1e-3            # 2
                    v3 = jnp.minimum(v3, v1)      # 1
                    v4 = jnp.maximum(v4, v2)      # 1
                    k1 = v3 > v4                  # 1
                    v1 = jnp.where(k1, v1, v2)    # 1
                    k2 = v2 < v3                  # 1
                    v2 = jnp.where(k2, v2 + 1e-9, v2)  # 2
            return (v1, v2, v3, v4)

        out = jax.lax.fori_loop(0, prims, body,
                                (v0, v0 * 1.1, v0 * 0.9, v0 * 1.2))
        o_ref[...] = out[0] + out[1] + out[2] + out[3]

    f2 = pl.pallas_call(
        kernel, grid=(blocks,),
        in_specs=[pl.BlockSpec((ROWS, RAY_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 6,
        out_specs=pl.BlockSpec((ROWS, RAY_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((blocks * ROWS, RAY_COLS),
                                       jnp.float32))

    @jax.jit
    def step(x):
        return jnp.sum(f2(x, *fields))

    dt = _med(step, x, iters)
    # Counted ops actually executed (loop rounds down to whole reps).
    unit = 8 if mix == "fma4" else 11
    ops = blocks * LANES * prims * (ops_per_iter // unit) * unit
    return dt, ops


def ceiling():
    rates = {}
    for mix in ("fma4", "occl"):
        pts = {}
        for ops in (88, 176):
            dt, total = calibrate(mix, ops)
            pts[ops] = (dt, total)
            print(f"  {mix} {ops} ops/iter: {dt*1e3:7.1f} ms "
                  f"({total/dt/1e12:.2f} T raw)")
        (d1, o1), (d2, o2) = pts[88], pts[176]
        marg = (o2 - o1) / (d2 - d1)
        rates[mix] = marg
        print(f"  {mix} marginal: {marg/1e12:.2f} T primitive-ops/s")
    ceil = max(rates.values())
    print(f"empirical ceiling: {ceil/1e12:.2f} T primitive-ops/s")
    return ceil


def participation():
    import dataclasses

    from audio_raytracer_tpu.models.raytracer import forward, random_scene
    from audio_raytracer_tpu.ops.fibonacci import fibonacci_directions
    from audio_raytracer_tpu.types import TraceConfig

    scene = random_scene(jax.random.key(0), num_spheres=1024,
                         num_aabbs=2048, num_obbs=1024, num_targets=4,
                         extent=60.0, size_range=(0.5, 4.0))
    dirs = fibonacci_directions(R)
    out = {}
    for life in (300.0, 125.0):
        cfg = TraceConfig(ray_count=R, max_bounces=4, max_ray_life=life,
                          max_muffle_hit_distance=250.0,
                          compact_rays=True)

        @jax.jit
        def hc(origin, dirs, scene, cfg=cfg):
            res, _ = forward(origin, dirs, scene, cfg,
                             collect_debug=True, backend="pallas")
            return jnp.bincount(res.hit_counts, length=6)

        hist = np.asarray(hc(jnp.zeros(3), dirs, scene)) / R
        ge = np.cumsum(hist[::-1])[::-1]
        occl = float(ge[1:6].sum())  # occl sweep at bounce k: P(hc>=k+1)
        out[life] = occl
        print(f"life={life}: P(hc>=1..5) = {np.round(ge[1:6], 4).tolist()}"
              f"  -> occl/closest sweeps (lower) = {occl:.3f}")
    return out, scene, dirs


def standalone(scene, dirs, rt):
    from audio_raytracer_tpu.ops.backend import NO_SKIP
    from audio_raytracer_tpu.ops.pallas import PallasBackend
    from audio_raytracer_tpu.ops.pallas.fused import (
        run_multi_chord_bwd,
        run_multi_chord_dens_bwd,
    )

    be = PallasBackend(scene)
    o = jax.random.uniform(jax.random.key(1), (R, 3), minval=-50,
                           maxval=50)
    dirs5 = [dirs] + [jnp.roll(dirs, 17 * (i + 1), axis=0)
                      for i in range(4)]
    limits = jnp.full((R, 5), 80.0)
    init = jnp.zeros((R, 5), bool)
    gbar = jnp.abs(jax.random.normal(jax.random.key(2), (R, 4))) * 1e-3

    @jax.jit
    def f_cl(o):
        hit, t, _ = be.closest_hit(o, dirs)
        return jnp.sum(jnp.where(hit, t, 0.0))

    @jax.jit
    def f_occ(o):
        return jnp.sum(be.multi_occluded(o, dirs5, limits,
                                         (NO_SKIP, 0, 1, 2, 3), init))

    @jax.jit
    def f_ch(o):
        return jnp.sum(be.multi_permeation_loss(
            o, dirs5[1:], (0, 1, 2, 3)))

    @jax.jit
    def f_dens(o):
        out = run_multi_chord_dens_bwd(be._fields, be.counts, o,
                                       dirs5[1:], (0, 1, 2, 3), gbar)
        return sum(jnp.sum(v) for v in out.values())

    @jax.jit
    def f_full(o):
        d_o, _, dens = run_multi_chord_bwd(be._fields, be.counts, o,
                                           dirs5[1:], (0, 1, 2, 3), gbar)
        return jnp.sum(d_o) + sum(jnp.sum(v) for v in dens.values())

    pairs = R * P
    for name, fn, ops in (("closest", f_cl, OPS_CLOSEST),
                          ("occl S=5", f_occ, OPS_OCCL5),
                          ("chord S=4", f_ch, OPS_CHORD4),
                          ("dens-bwd S=4", f_dens, OPS_DENS_BWD4),
                          ("full-bwd S=4", f_full, None)):
        dev = _med(fn, o) - rt
        rate = (f"{pairs*ops/dev/1e12:.2f} T primitive-ops/s achieved"
                if ops else "(ray-cotangent adjoint; no static count)")
        print(f"{name}: {dev*1e3:6.1f} ms device  {rate}")


def floors(ceil, sweeps):
    pairs = R * P
    for life, label in ((300.0, "fwd (300 life)"),
                        (125.0, "fwd (125 life)")):
        s = sweeps[life]
        ops = pairs * (s * (OPS_CLOSEST + OPS_OCCL5) + OPS_CHORD4)
        print(f"{label}: counted {ops/1e12:.2f}e12 ops -> floor "
              f"{ops/ceil*1e3:.0f} ms at {ceil/1e12:.2f} T/s")
    # fwd+bwd (materials): the training path runs uncompacted (measured
    # ray-life-independent), so closest/occl sweep at participation 1.0
    # x 5 bounces; + one chord forward (custom_vjp primal/linearization)
    # + the density-only adjoint. The lax.scan transpose / XLA fusion
    # residue (~140 ms measured) is outside the counted-kernel floor.
    ops = pairs * (5 * (OPS_CLOSEST + OPS_OCCL5) + OPS_CHORD4
                   + OPS_DENS_BWD4)
    print(f"fwd+bwd (materials): counted {ops/1e12:.2f}e12 ops -> "
          f"kernel floor {ops/ceil*1e3:.0f} ms at {ceil/1e12:.2f} T/s")


def main():
    print("device:", jax.devices()[0].device_kind)
    rt = roundtrip_ms()
    ceil = ceiling()
    sweeps, scene, dirs = participation()
    standalone(scene, dirs, rt)
    floors(ceil, sweeps)


if __name__ == "__main__":
    main()
