"""DSP chain tests: associative-scan IIRs vs a literal per-sample loop.

The NumPy loop below mirrors the reference's per-sample C# code
(MuffleDSP.cs / ReverbDSP.cs / BinauralDSP.cs / AudioSpatializer.cs) and
is the oracle for the vectorized chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_raytracer_tpu.models.spatializer import (
    DSPState,
    SpatializerSettings,
    spatialize,
)
from audio_raytracer_tpu.types import TargetSettings
from audio_raytracer_tpu.utils.curves import SampledCurve

SR = 48000


def oracle_chain(buf, settings_vals, muffle_strength, reverb_volume,
                 local_dir, distance, volume_mult=1.0):
    """Scalar-loop oracle of the full chain with Default settings."""
    out = buf.copy()
    n = len(out)

    # Muffle (curve = identity).
    muffle_prev = np.zeros(2)
    if muffle_strength > 0:
        m = muffle_strength
        cutoff = 8000.0 + (75.0 - 8000.0) * m
        rc = 1.0 / (cutoff * 2 * np.pi)
        dt = 1.0 / SR
        alpha = dt / (rc + dt)
        for i in range(n):
            for ch in range(2):
                muffle_prev[ch] += alpha * (out[i, ch] - muffle_prev[ch])
                out[i, ch] = muffle_prev[ch]

    # Reverb dry boost (curve = identity).
    boost = 1.0 + (3.0 - 1.0) * reverb_volume
    out *= boost

    # Binaural.
    az = np.arctan2(local_dir[0], local_dir[2])
    pan_strength = 0.8 * min(1.0, distance / 5.0)
    pan = np.sin(az) * pan_strength
    lg, rg = np.sqrt(0.5 * (1 - pan)), np.sqrt(0.5 * (1 + pan))
    front = max(0.0, np.cos(az))
    rear = (1 - 0.2) + 0.2 * front
    dist_factor = min(1.0, max(0.0, 1 - distance / 15.0))
    rear = np.clip(rear * dist_factor, 0.8, 1.0)
    y = local_dir[1]
    if y <= 0:
        elev = 1.0 + (0.85 - 1.0) * min(1.0, -y)
    else:
        elev = 1.0 + (1.15 - 1.0) * min(1.0, y)
    gains = np.array([lg, rg]) * rear * elev
    out *= gains

    dist_elev = min(1.0, distance / 12.0)
    lp_prev = np.zeros(2)
    hp_prev = np.zeros(2)
    hp_prev_in = np.zeros(2)
    dt = 1.0 / SR
    if y <= 0:
        cutoff = (5000.0 + (22000.0 - 5000.0) * min(1.0, -y)) * (
            1 - 0.5 * dist_elev)
        rc = 1.0 / (cutoff * 2 * np.pi)
        alpha = dt / (rc + dt)
        for i in range(n):
            for ch in range(2):
                lp_prev[ch] += alpha * (out[i, ch] - lp_prev[ch])
                out[i, ch] = lp_prev[ch]
    else:
        cutoff = (25.0 + (150.0 - 25.0) * min(1.0, y)) * (1 + 0.5 * dist_elev)
        rc = 1.0 / (cutoff * 2 * np.pi)
        alpha = rc / (rc + dt)
        for i in range(n):
            for ch in range(2):
                o = alpha * (hp_prev[ch] + out[i, ch] - hp_prev_in[ch])
                hp_prev_in[ch] = out[i, ch]
                hp_prev[ch] = o
                out[i, ch] = o

    return out * volume_mult


def make_rt(muffle, reverb_strength, reverb_volume):
    return TargetSettings(
        muffle=jnp.asarray([muffle]),
        reverb_strength=jnp.asarray(reverb_strength),
        reverb_volume=jnp.asarray(reverb_volume),
        perceived_position=jnp.zeros((1, 3)),
    )


@pytest.fixture
def noise(rng):
    return rng.standard_normal((256, 2)).astype(np.float32) * 0.3


class TestSpatializerParity:
    @pytest.mark.parametrize("case", [
        dict(muffle=0.7, rv=0.4, dir=[0.5, -0.3, 0.8], dist=4.0),
        dict(muffle=0.0, rv=0.9, dir=[-0.6, 0.5, 0.6], dist=10.0),
        dict(muffle=1.0, rv=0.0, dir=[0.0, -1.0, 0.0], dist=2.0),
        dict(muffle=0.2, rv=0.5, dir=[0.9, 0.1, -0.4], dist=20.0),
    ])
    def test_matches_scalar_oracle(self, noise, case):
        d = np.asarray(case["dir"], np.float64)
        d = d / np.linalg.norm(d)
        settings = SpatializerSettings.default()
        rt = make_rt(case["muffle"], 0.5, case["rv"])
        out, state, dry = spatialize(
            jnp.asarray(noise), DSPState.zero(), settings, rt, 0,
            jnp.asarray(d, jnp.float32), jnp.asarray(case["dist"]), SR)
        expect = oracle_chain(noise.astype(np.float64), None,
                              case["muffle"], case["rv"], d, case["dist"])
        np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-3,
                                   atol=2e-4)

    def test_state_continuity(self, noise):
        """Processing two half-buffers with threaded state must equal one
        full-buffer pass (the audio-thread streaming contract)."""
        settings = SpatializerSettings.default()
        rt = make_rt(0.6, 0.5, 0.3)
        d = jnp.asarray([0.3, -0.5, 0.6])
        d = d / jnp.linalg.norm(d)
        dist = jnp.asarray(6.0)

        full, _, _ = spatialize(jnp.asarray(noise), DSPState.zero(),
                                settings, rt, 0, d, dist, SR)
        st = DSPState.zero()
        h1, st, _ = spatialize(jnp.asarray(noise[:128]), st, settings, rt,
                               0, d, dist, SR)
        h2, st, _ = spatialize(jnp.asarray(noise[128:]), st, settings, rt,
                               0, d, dist, SR)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(h1), np.asarray(h2)]),
            np.asarray(full), rtol=1e-5, atol=1e-6)

    def test_muffle_attenuates_highs(self, rng):
        # A high-frequency tone should lose energy under full muffle.
        t = np.arange(512) / SR
        tone = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
        buf = jnp.asarray(np.stack([tone, tone], -1))
        settings = SpatializerSettings.default()
        d = jnp.asarray([0.0, -0.1, 1.0])
        d = d / jnp.linalg.norm(d)
        out_clear, _, _ = spatialize(buf, DSPState.zero(), settings,
                                     make_rt(0.0, 0.0, 0.0), 0, d,
                                     jnp.asarray(3.0), SR)
        out_muff, _, _ = spatialize(buf, DSPState.zero(), settings,
                                    make_rt(1.0, 0.0, 0.0), 0, d,
                                    jnp.asarray(3.0), SR)
        e_clear = float(jnp.sum(out_clear ** 2))
        e_muff = float(jnp.sum(out_muff ** 2))
        assert e_muff < 0.05 * e_clear

    def test_panning_direction(self):
        buf = jnp.ones((64, 2), jnp.float32)
        settings = SpatializerSettings.default()
        right = jnp.asarray([1.0, 0.0, 0.0])
        out_r, _, _ = spatialize(buf, DSPState.zero(), settings,
                                 make_rt(0.0, 0.0, 0.0), 0, right,
                                 jnp.asarray(10.0), SR)
        assert float(jnp.mean(out_r[:, 1])) > float(jnp.mean(out_r[:, 0]))

    def test_reverb_dry_level_mapping(self):
        settings = SpatializerSettings.default()
        buf = jnp.zeros((8, 2))
        d = jnp.asarray([0.0, 0.5, 0.8])
        _, _, dry0 = spatialize(buf, DSPState.zero(), settings,
                                make_rt(0, 0.0, 0), 0, d, jnp.asarray(1.0), SR)
        _, _, dry1 = spatialize(buf, DSPState.zero(), settings,
                                make_rt(0, 1.0, 0), 0, d, jnp.asarray(1.0), SR)
        assert float(dry0) == 0.0
        assert float(dry1) == -2000.0


class TestSampledCurve:
    def test_identity_default(self):
        c = SampledCurve.linear()
        for v in [0.0, 0.25, 0.5, 0.77, 1.0]:
            np.testing.assert_allclose(float(c.evaluate(jnp.asarray(v))), v,
                                       atol=1e-6)

    def test_clamps(self):
        c = SampledCurve.linear()
        assert float(c.evaluate(jnp.asarray(-0.5))) == 0.0
        assert float(c.evaluate(jnp.asarray(1.5))) == 1.0

    def test_nonlinear(self):
        c = SampledCurve.from_fn(lambda t: t ** 2, k=200)
        np.testing.assert_allclose(float(c.evaluate(jnp.asarray(0.5))), 0.25,
                                   atol=1e-4)


class TestReverbTail:
    """IR-driven convolution reverb (the audible tail the reference
    delegates to Unity's AudioReverbFilter; ReverbDSP.cs:10-24 +
    AudioSpatializer.cs:58 only set gains)."""

    SR = 8000.0

    def _setup(self, n_bins=8, ir_max=40.0):
        import dataclasses

        from audio_raytracer_tpu.models.spatializer import (
            DSPState,
            SpatializerSettings,
            ir_kernel_length,
            ir_to_fir,
        )

        settings = dataclasses.replace(
            SpatializerSettings.default(),
            render_reverb_tail=True,
            reverb_ir_max_distance=jnp.float32(ir_max),
            # Neutralize the rest of the chain so the oracle is pure
            # convolution: no muffle, no pan/rear/elevation shaping.
            pan_strength=jnp.float32(0.0),
            rear_attenuation_strength=jnp.float32(0.0),
            low_pass_volume=jnp.float32(1.0),
            high_pass_volume=jnp.float32(1.0),
            reverb_dry_boost=__import__(
                "audio_raytracer_tpu.models.spatializer",
                fromlist=["x"]).MinMax.of(1.0, 1.0),
        )
        L = ir_kernel_length(n_bins, ir_max, self.SR)
        return settings, L, ir_to_fir

    def test_fir_unit_energy_and_tap_times(self):
        from audio_raytracer_tpu.ops.reverb import SPEED_OF_SOUND

        settings, L, ir_to_fir = self._setup()
        ir = jnp.asarray([0.0, 4.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0])
        h = np.asarray(ir_to_fir(ir, 40.0, self.SR, L))
        np.testing.assert_allclose((h ** 2).sum(), 1.0, rtol=1e-6)
        width = 40.0 / SPEED_OF_SOUND / 8
        exp_idx = [int(round((b + 0.5) * width * self.SR)) for b in (1, 3)]
        nz = np.nonzero(h)[0]
        np.testing.assert_array_equal(nz, exp_idx)
        # sqrt-energy amplitudes: 4.0 energy -> 2x the 1.0 bin's tap.
        np.testing.assert_allclose(h[exp_idx[0]] / h[exp_idx[1]], 2.0,
                                   rtol=1e-6)

    def test_tail_matches_numpy_convolution_oracle(self, rng):
        """Stream 4 buffers through spatialize and compare the wet part
        against one flat np.convolve over the concatenated signal."""
        import dataclasses

        from audio_raytracer_tpu.models.spatializer import (
            DSPState,
            ir_to_fir,
            spatialize,
        )

        settings, L, _ = self._setup()
        N = 256
        n_buf = 4
        sig = rng.standard_normal((n_buf * N, 2)).astype(np.float32) * 0.1
        ir = jnp.asarray([0.0, 2.0, 0.5, 0.0, 1.0, 0.0, 0.0, 0.2])
        rt = TargetSettings(
            muffle=jnp.zeros((1,)),  # muffle==0 -> LP bypassed
            reverb_strength=jnp.asarray(1.0),
            reverb_volume=jnp.asarray(0.0),  # dry boost = min = 1.0
            perceived_position=jnp.zeros((1, 3)),
        )
        local = jnp.asarray([0.0, 0.0, 1.0])  # dead ahead, y=0
        state = DSPState.zero(tail_len=L - 1)
        outs = []
        for b in range(n_buf):
            buf = jnp.asarray(sig[b * N:(b + 1) * N])
            out, state, _ = spatialize(buf, state, settings, rt, 0, local,
                                       jnp.asarray(5.0), self.SR,
                                       reverb_ir=ir)
            outs.append(np.asarray(out))
        got = np.concatenate(outs, axis=0)

        # Oracle: equal-power center pan leaves gain sqrt(0.5) on both
        # channels (pan_strength 0 -> pan 0); the binaural LP at y=0
        # runs with the below-horizon branch's max cutoff — neutralize
        # by comparing against the same dry path: dry = chain(sig),
        # wet = wet_gain * conv(dry, h).
        h = np.asarray(ir_to_fir(ir, 40.0, self.SR, L))
        wet_gain = float(settings.reverb_wet_level.lerp(
            settings.reverb_strength_curve.evaluate(1.0)))
        # Recompute the dry chain output by running with the tail off.
        settings_dry = dataclasses.replace(settings,
                                           render_reverb_tail=False)
        state_d = DSPState.zero()
        drys = []
        for b in range(n_buf):
            buf = jnp.asarray(sig[b * N:(b + 1) * N])
            out_d, state_d, _ = spatialize(buf, state_d, settings_dry, rt,
                                           0, local, jnp.asarray(5.0),
                                           self.SR)
            drys.append(np.asarray(out_d))
        dry = np.concatenate(drys, axis=0)
        want = dry.copy()
        for ch in range(2):
            w = np.convolve(dry[:, ch], wet_gain * h)[: dry.shape[0]]
            want[:, ch] += w
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_tail_energy_bounded_and_decays(self, rng):
        """An impulse through the tail stage must inject finite wet
        energy (unit-energy FIR x wet gain) and ring out to ~zero."""
        from audio_raytracer_tpu.models.spatializer import (
            DSPState,
            spatialize,
        )

        settings, L, _ = self._setup()
        N = 256
        ir = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.0, 0.0, 0.0, 0.0])
        rt = TargetSettings(
            muffle=jnp.zeros((1,)),
            reverb_strength=jnp.asarray(1.0),
            reverb_volume=jnp.asarray(0.0),
            perceived_position=jnp.zeros((1, 3)),
        )
        local = jnp.asarray([0.0, 0.0, 1.0])
        state = DSPState.zero(tail_len=L - 1)
        impulse = np.zeros((N, 2), np.float32)
        impulse[0] = 1.0
        total = 0.0
        last = None
        n_bufs = (L - 1) // N + 3
        for b in range(n_bufs):
            buf = jnp.asarray(impulse if b == 0
                              else np.zeros((N, 2), np.float32))
            out, state, _ = spatialize(buf, state, settings, rt, 0, local,
                                       jnp.asarray(5.0), self.SR,
                                       reverb_ir=ir)
            last = np.asarray(out)
            total += float((last ** 2).sum())
        assert np.isfinite(total) and total > 0.0
        # Dry impulse energy through the neutral chain ~ 1; wet adds at
        # most wet_gain^2 (unit-energy FIR).
        assert total < 4.0
        # Tail rang out: the final buffer is silent.
        assert float(np.abs(last).max()) < 1e-5


class TestTailStatePreservation:
    """The tail carry must survive calls where the tail stage doesn't
    run (e.g. no IR harvested yet at stream start) — dropping it would
    truncate ringing audio, permanently disable the stage (None state
    thereafter), and retrace under jit."""

    def test_tail_survives_ir_less_call(self):
        import dataclasses

        from audio_raytracer_tpu.models.spatializer import (
            DSPState,
            SpatializerSettings,
            ir_kernel_length,
            spatialize,
        )

        sr = 8000.0
        settings = dataclasses.replace(
            SpatializerSettings.default(), render_reverb_tail=True,
            reverb_ir_max_distance=jnp.float32(40.0))
        L = ir_kernel_length(8, 40.0, sr)
        state = DSPState.zero(tail_len=L - 1)
        rt = TargetSettings(muffle=jnp.zeros((1,)),
                            reverb_strength=jnp.asarray(1.0),
                            reverb_volume=jnp.asarray(0.0),
                            perceived_position=jnp.zeros((1, 3)))
        local = jnp.asarray([0.0, 0.0, 1.0])
        impulse = jnp.zeros((64, 2)).at[0, :].set(1.0)
        ir = jnp.asarray([1.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])

        # Call 1 WITH an IR: charges the tail carry.
        _, state, _ = spatialize(impulse, state, settings, rt, 0, local,
                                 jnp.asarray(5.0), sr, reverb_ir=ir)
        assert state.reverb_tail is not None
        charged = float(jnp.abs(state.reverb_tail).sum())
        assert charged > 0.0
        # Call 2 WITHOUT an IR (orchestrator warm-up case): the carry
        # must survive untouched, not be dropped to None.
        _, state, _ = spatialize(jnp.zeros((64, 2)), state, settings, rt,
                                 0, local, jnp.asarray(5.0), sr,
                                 reverb_ir=None)
        assert state.reverb_tail is not None
        np.testing.assert_allclose(float(jnp.abs(state.reverb_tail).sum()),
                                   charged)
        # Call 3 with the IR again: the stage still works.
        out, state, _ = spatialize(jnp.zeros((64, 2)), state, settings, rt,
                                   0, local, jnp.asarray(5.0), sr,
                                   reverb_ir=ir)
        assert float(jnp.abs(np.asarray(out)).max()) > 0.0  # tail rings
