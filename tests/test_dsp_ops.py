"""Unit tests for the demod DSP kernels: FIR, AGC, Costas, clock recovery.

All complex data uses the CF32 real-pair (the TPU backend has no complex
dtype); tests convert at the edges with from_complex/to_complex.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Compile-heavy on XLA:CPU -- excluded from the quick tier (build.sh).
pytestmark = pytest.mark.heavy

from xritdemod_tpu.ops import agc as agc_op
from xritdemod_tpu.ops import clock_recovery as cr_op
from xritdemod_tpu.ops import costas as costas_op
from xritdemod_tpu.ops import fir
from xritdemod_tpu.utils.cplx import CF32, from_complex, to_complex


def crandn(rng, *shape):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)


# ---------------------------------------------------------------------------
# FIR
# ---------------------------------------------------------------------------
class TestFir:
    def test_matches_numpy_convolve(self, rng):
        taps = rng.normal(size=31).astype(np.float32)
        x = crandn(rng, 256)
        y, _ = fir.fir_block(from_complex(x), jnp.asarray(taps), fir.fir_init(31))
        xe = np.concatenate([np.zeros(30, np.complex64), x])
        ref = np.array(
            [np.dot(taps, xe[n : n + 31]) for n in range(256)], np.complex64
        )
        np.testing.assert_allclose(to_complex(y), ref, rtol=1e-4, atol=1e-5)

    def test_decimation(self, rng):
        taps = jnp.asarray(rng.normal(size=15).astype(np.float32))
        x = from_complex(crandn(rng, 240))
        y, _ = fir.fir_block(x, taps, fir.fir_init(15), 4)
        yfull, _ = fir.fir_block(x, taps, fir.fir_init(15))
        np.testing.assert_allclose(to_complex(y), to_complex(yfull)[::4], rtol=1e-5)
        assert y.shape[-1] == 60

    def test_block_continuity(self, rng):
        """Two half blocks with carried history == one full block."""
        taps = jnp.asarray(rng.normal(size=21).astype(np.float32))
        x = crandn(rng, 512)
        full, _ = fir.fir_block(from_complex(x), taps, fir.fir_init(21))
        h = fir.fir_init(21)
        y1, h = fir.fir_block(from_complex(x[:256]), taps, h)
        y2, _ = fir.fir_block(from_complex(x[256:]), taps, h)
        np.testing.assert_allclose(
            np.concatenate([to_complex(y1), to_complex(y2)]),
            to_complex(full),
            rtol=1e-4,
            atol=1e-6,
        )

    def test_batched(self, rng):
        taps = jnp.asarray(rng.normal(size=9).astype(np.float32))
        x = crandn(rng, 3, 5, 64)
        hist = fir.fir_init(9, leading_shape=(3, 5))
        y, nh = fir.fir_block(from_complex(x), taps, hist)
        assert y.shape == (3, 5, 64)
        assert nh.shape == (3, 5, 8)
        y0, _ = fir.fir_block(from_complex(x[1, 3]), taps, fir.fir_init(9))
        np.testing.assert_allclose(to_complex(y)[1, 3], to_complex(y0), rtol=1e-5)


# ---------------------------------------------------------------------------
# AGC
# ---------------------------------------------------------------------------
class TestAgc:
    def test_associative_matches_exact(self, rng):
        params = agc_op.AgcParams(rate=0.01, reference=0.5, gain=1.0, max_gain=4000.0)
        x = from_complex(crandn(rng, 4096))
        g0 = agc_op.agc_init(params)
        y1, gf1 = agc_op.agc_block(x, g0, params)
        y2, gf2 = agc_op.agc_block_exact(x, g0, params)
        np.testing.assert_allclose(to_complex(y1), to_complex(y2), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(float(gf1), float(gf2), rtol=1e-3)

    def test_converges_to_reference_level(self, rng):
        params = agc_op.AgcParams(rate=0.01, reference=0.5, gain=1.0, max_gain=4000.0)
        ph = rng.uniform(0, 2 * np.pi, 8192)
        x = from_complex((0.05 * np.exp(1j * ph)).astype(np.complex64))
        y, gain = agc_op.agc_block(x, agc_op.agc_init(params), params)
        tail = np.abs(to_complex(y)[-1000:])
        assert abs(tail.mean() - 0.5) < 0.01
        assert abs(float(gain) - 10.0) < 0.5

    def test_block_continuity(self, rng):
        params = agc_op.AgcParams()
        x = crandn(rng, 2048)
        yf, _ = agc_op.agc_block(from_complex(x), agc_op.agc_init(params), params)
        g = agc_op.agc_init(params)
        y1, g = agc_op.agc_block(from_complex(x[:1024]), g, params)
        y2, _ = agc_op.agc_block(from_complex(x[1024:]), g, params)
        np.testing.assert_allclose(
            np.concatenate([to_complex(y1), to_complex(y2)]),
            to_complex(yf),
            rtol=1e-3,
            atol=1e-5,
        )

    def test_max_gain_clamps(self):
        params = agc_op.AgcParams(rate=0.01, reference=0.5, gain=1.0, max_gain=40.0)
        x = CF32(jnp.full(20000, 1e-6, jnp.float32), jnp.zeros(20000, jnp.float32))
        _, gain = agc_op.agc_block(x, agc_op.agc_init(params), params)
        assert float(gain) <= 40.0 + 1e-3


# ---------------------------------------------------------------------------
# Costas
# ---------------------------------------------------------------------------
class TestCostas:
    def test_locks_frequency_offset(self, rng):
        params = costas_op.costas_gains(0.01)
        nsym = 30000
        bpsk = (1.0 - 2.0 * rng.integers(0, 2, nsym)).astype(np.float64)
        f = 0.002  # rad/sample offset
        n = np.arange(nsym)
        x = (bpsk * np.exp(1j * (f * n + 0.5))).astype(np.complex64)
        y, st = costas_op.costas_block(from_complex(x), costas_op.costas_init(), params)
        assert abs(float(st.freq) - f) < 2e-4
        tail = to_complex(y)[-5000:]
        assert np.abs(tail.imag).mean() < 0.1
        assert np.abs(tail.real).mean() > 0.9

    def test_block_continuity(self, rng):
        params = costas_op.costas_gains(0.0037)
        x = (
            np.exp(1j * 0.001 * np.arange(4096))
            * (1 - 2 * rng.integers(0, 2, 4096))
        ).astype(np.complex64)
        yf, stf = costas_op.costas_block(from_complex(x), costas_op.costas_init(), params)
        st = costas_op.costas_init()
        y1, st = costas_op.costas_block(from_complex(x[:2048]), st, params)
        y2, st2 = costas_op.costas_block(from_complex(x[2048:]), st, params)
        np.testing.assert_allclose(
            np.concatenate([to_complex(y1), to_complex(y2)]),
            to_complex(yf),
            rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_allclose(float(st2.freq), float(stf.freq), atol=1e-7)

    def test_batched_vmap(self, rng):
        params = costas_op.costas_gains(0.005)
        x = crandn(rng, 4, 512)
        st = costas_op.costas_init((4,))
        y, st2 = costas_op.costas_block(from_complex(x), st, params)
        assert y.shape == (4, 512)
        y0, _ = costas_op.costas_block(
            from_complex(x[2]), costas_op.costas_init(), params
        )
        np.testing.assert_allclose(
            to_complex(y)[2], to_complex(y0), rtol=1e-4, atol=1e-5
        )


# ---------------------------------------------------------------------------
# Clock recovery
# ---------------------------------------------------------------------------
def _shaped_bpsk(rng, nsym, sps, snr_db=30.0, timing_phase=0.3):
    """BPSK at `sps` samples/symbol with RRC shaping."""
    from xritdemod_tpu.ops import filters

    os_factor = 8
    ntaps = 101
    bits = rng.integers(0, 2, nsym)
    syms = 1.0 - 2.0 * bits.astype(np.float64)
    fine_len = int((nsym + 2) * sps * os_factor) + ntaps * os_factor
    impulses = np.zeros(fine_len)
    pos = ((np.arange(nsym) + timing_phase) * sps * os_factor).astype(np.int64)
    impulses[pos] = syms
    fs = 1.0
    rc = filters.rrc_taps(1.0, fs * os_factor * sps, fs, 0.5, ntaps * os_factor)
    shaped = np.convolve(impulses, rc.astype(np.float64) * os_factor, mode="same")
    sig = shaped[::os_factor]
    noise_amp = 10 ** (-snr_db / 20)
    sig = sig + rng.normal(size=len(sig)) * noise_amp
    return sig.astype(np.complex64), bits


class TestClockRecovery:
    def test_recovers_symbols(self, rng):
        sps = 4.2534
        params = cr_op.ClockRecoveryParams(
            omega=sps, gain_omega=0.0037**2 / 4, gain_mu=0.0037
        )
        sig, bits = _shaped_bpsk(rng, 4000, sps)
        nslots = cr_op.max_symbols(len(sig), params)
        syms, valid, _ = cr_op.clock_recovery_block(
            from_complex(sig), cr_op.clock_recovery_init(params), params, nslots
        )
        soft = np.asarray(syms.re)[np.asarray(valid)]
        # discard the acquisition transient (the loop gain 0.0037 converges in
        # ~2000 symbols), compare hard decisions allowing small symbol offset
        start = 2500
        got = (soft[start : start + 1200] < 0).astype(int)
        best = 0
        for off in range(-8, 9):
            w = bits[start + off : start + off + len(got)]
            agree = max((got == w).mean(), (got != w).mean())
            best = max(best, agree)
        assert best > 0.999

    def test_block_continuity(self, rng):
        sps = 4.2534
        params = cr_op.ClockRecoveryParams(
            omega=sps, gain_omega=0.0037**2 / 4, gain_mu=0.0037
        )
        sig, _ = _shaped_bpsk(rng, 2000, sps)
        T = len(sig) // 2 * 2
        sig = sig[:T]
        nslots = cr_op.max_symbols(T, params)
        s_all, v_all, _ = cr_op.clock_recovery_block(
            from_complex(sig), cr_op.clock_recovery_init(params), params, nslots
        )
        full = np.asarray(s_all.re)[np.asarray(v_all)]

        half = T // 2
        nsl = cr_op.max_symbols(half, params)
        st = cr_op.clock_recovery_init(params)
        s1, v1, st = cr_op.clock_recovery_block(from_complex(sig[:half]), st, params, nsl)
        s2, v2, _ = cr_op.clock_recovery_block(from_complex(sig[half:]), st, params, nsl)
        split = np.concatenate(
            [np.asarray(s1.re)[np.asarray(v1)], np.asarray(s2.re)[np.asarray(v2)]]
        )
        n = min(len(full), len(split))
        assert abs(len(full) - len(split)) <= 1
        np.testing.assert_allclose(split[:n], full[:n], rtol=1e-3, atol=1e-4)

    def test_vmap_batches(self, rng):
        sps = 4.0
        params = cr_op.ClockRecoveryParams(omega=sps, gain_omega=1e-6, gain_mu=2e-3)
        sig, _ = _shaped_bpsk(rng, 500, sps)
        batch = from_complex(np.stack([sig] * 3))
        nslots = cr_op.max_symbols(len(sig), params)
        init = jax.vmap(lambda _: cr_op.clock_recovery_init(params))(jnp.arange(3))
        syms, valid, st = jax.vmap(
            lambda x, s: cr_op.clock_recovery_block(x, s, params, nslots)
        )(batch, init)
        assert syms.re.shape == (3, nslots)
        np.testing.assert_allclose(np.asarray(syms.re[0]), np.asarray(syms.re[2]))


class TestClockPallas:
    def test_pallas_matches_exact_interpret(self, rng):
        """The Pallas kernel (interpret mode) reproduces the exact XLA
        kernel's clock trajectory and symbols (tiny config — interpret
        executes op-by-op)."""
        import jax

        from xritdemod_tpu.models.demodulator import DemodConfig
        from xritdemod_tpu.ops import clock_recovery as cr
        from xritdemod_tpu.ops.clock_pallas import (
            clock_recovery_block_pallas_batch,
        )
        from xritdemod_tpu.utils.cplx import CF32

        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        T, C = 1 << 10, 128
        t = np.arange(T)
        sig = (
            np.cos(2 * np.pi * 0.117 * t) * 0.4
            + rng.normal(0, 0.05, T)
            + 1j * rng.normal(0, 0.05, T)
        ).astype(np.complex64)
        x = CF32(
            jnp.asarray(np.tile(sig.real, (C, 1)).astype(np.float32)),
            jnp.asarray(np.tile(sig.imag, (C, 1)).astype(np.float32)),
        )
        params = cr.ClockRecoveryParams(
            cfg.sps,
            cfg.clock_alpha**2 / 4,
            cfg.clock_alpha,
            cfg.clock_omega_limit,
        )
        ns = cr.max_symbols(T, params)
        st = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (C,) + a.shape),
            cr.clock_recovery_init(params, cfg.clock_mu),
        )
        s_ex, v_ex, st_ex = cr.clock_recovery_block_batch(
            x, st, params, ns, chunk=4, superchunks=2
        )
        s_pl, v_pl, st_pl = clock_recovery_block_pallas_batch(
            x, st, params, ns, chunk=4, superchunks=2, ct=128, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(v_ex), np.asarray(v_pl))
        np.testing.assert_array_equal(
            np.asarray(st_ex.ii), np.asarray(st_pl.ii)
        )
        np.testing.assert_allclose(
            np.asarray(st_ex.mu), np.asarray(st_pl.mu), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_ex.re), np.asarray(s_pl.re), atol=1e-6
        )

    def test_block_update_pallas_matches_xla(self, rng):
        """The fused block-update branch (interpret mode) reproduces the
        XLA block-update kernel: same trajectory, same symbols."""
        import jax

        from xritdemod_tpu.models.demodulator import DemodConfig
        from xritdemod_tpu.ops import clock_recovery as cr
        from xritdemod_tpu.ops.clock_pallas import (
            clock_recovery_block_pallas_batch,
        )
        from xritdemod_tpu.utils.cplx import CF32

        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        T, C = 1 << 10, 128
        t = np.arange(T)
        sig = (
            np.cos(2 * np.pi * 0.117 * t) * 0.4
            + rng.normal(0, 0.05, T)
            + 1j * rng.normal(0, 0.05, T)
        ).astype(np.complex64)
        x = CF32(
            jnp.asarray(np.tile(sig.real, (C, 1)).astype(np.float32)),
            jnp.asarray(np.tile(sig.imag, (C, 1)).astype(np.float32)),
        )
        params = cr.ClockRecoveryParams(
            cfg.sps,
            cfg.clock_alpha**2 / 4,
            cfg.clock_alpha,
            cfg.clock_omega_limit,
        )
        ns = cr.max_symbols(T, params)
        st = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (C,) + a.shape),
            cr.clock_recovery_init(params, cfg.clock_mu),
        )
        s_x, v_x, st_x = cr.clock_recovery_block_update_batch(
            x, st, params, ns, chunk=4, superchunks=2
        )
        s_p, v_p, st_p = clock_recovery_block_pallas_batch(
            x, st, params, ns, chunk=4, superchunks=2, ct=128,
            interpret=True, block_update=True,
        )
        np.testing.assert_array_equal(np.asarray(v_x), np.asarray(v_p))
        np.testing.assert_array_equal(
            np.asarray(st_x.ii), np.asarray(st_p.ii)
        )
        np.testing.assert_allclose(
            np.asarray(st_x.mu), np.asarray(st_p.mu), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(st_x.omega), np.asarray(st_p.omega), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(s_x.re), np.asarray(s_p.re), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s_x.im), np.asarray(s_p.im), atol=1e-5
        )
        for a, b in zip(jax.tree.leaves(st_x.p), jax.tree.leaves(st_p.p)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


class TestStreamPallas:
    """Pallas sequential AGC/Costas kernels (interpret mode) vs the exact
    XLA recursions."""

    def _signal(self, rng, C=128, T=1024):
        from xritdemod_tpu.utils.cplx import CF32

        return CF32(
            jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
        )

    def test_agc_matches_exact(self, rng):
        from xritdemod_tpu.ops import agc as agc_op
        from xritdemod_tpu.ops.stream_pallas import agc_block_pallas

        x = self._signal(rng)
        p = agc_op.AgcParams()
        g0 = agc_op.agc_init(p, (128,))
        y1, g1 = agc_op.agc_block_exact(x, g0, p)
        y2, g2 = agc_block_pallas(x, g0, p, rows=256, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y1.re), np.asarray(y2.re), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)

    def test_costas_matches_scan(self, rng):
        from xritdemod_tpu.ops import costas as costas_op
        from xritdemod_tpu.ops.stream_pallas import costas_block_pallas

        x = self._signal(rng)
        cp = costas_op.costas_gains(0.0037)
        st = costas_op.costas_init((128,))
        z1, s1 = costas_op.costas_block(x, st, cp)
        z2, s2 = costas_block_pallas(x, st, cp, rows=256, interpret=True)
        np.testing.assert_allclose(
            np.asarray(z1.re), np.asarray(z2.re), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s1.phase), np.asarray(s2.phase), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s1.freq), np.asarray(s2.freq), atol=1e-6
        )

    def test_state_chains_across_blocks(self, rng):
        """Two consecutive Pallas blocks == one double-length block."""
        from xritdemod_tpu.ops import costas as costas_op
        from xritdemod_tpu.ops.stream_pallas import costas_block_pallas
        from xritdemod_tpu.utils.cplx import CF32

        x = self._signal(rng, T=2048)
        cp = costas_op.costas_gains(0.0037)
        st = costas_op.costas_init((128,))
        xa = CF32(x.re[:, :1024], x.im[:, :1024])
        xb = CF32(x.re[:, 1024:], x.im[:, 1024:])
        za, sa = costas_block_pallas(xa, st, cp, rows=256, interpret=True)
        zb, sb = costas_block_pallas(xb, sa, cp, rows=256, interpret=True)
        zf, sf = costas_block_pallas(x, st, cp, rows=256, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(zf.re[:, 1024:]), np.asarray(zb.re)
        )
        np.testing.assert_array_equal(
            np.asarray(sf.phase), np.asarray(sb.phase)
        )


class TestFrontendPallas:
    """Fused AGC+RRC+Costas kernel (interpret mode) vs the split stages."""

    def _setup(self, rng, C=128, T=1024):
        from xritdemod_tpu.ops import filters

        x = CF32(
            jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
        )
        taps = filters.rrc_taps(1.0, 1_250_000, 293_883, 0.5, 63)
        agc_p = agc_op.AgcParams()
        cp = costas_op.costas_gains(0.0037)
        g0 = agc_op.agc_init(agc_p, (C,))
        h0 = fir.fir_init(len(taps), (C,))
        cs0 = costas_op.costas_init((C,))
        return x, tuple(float(v) for v in taps), agc_p, cp, g0, h0, cs0

    def _split(self, x, taps, agc_p, cp, g0, h0, cs0):
        y, g = agc_op.agc_block_exact(x, g0, agc_p)
        y, h = fir.fir_block(y, jnp.asarray(taps), h0, method="matmul")
        y, cs = costas_op.costas_block(y, cs0, cp)
        return y, g, h, cs

    def test_fused_matches_split(self, rng):
        from xritdemod_tpu.ops.frontend_pallas import demod_frontend_pallas

        x, taps, agc_p, cp, g0, h0, cs0 = self._setup(rng)
        y1, g1, h1, cs1 = self._split(x, taps, agc_p, cp, g0, h0, cs0)
        xT = CF32(x.re.T, x.im.T)
        yT, g2, h2, cs2 = demod_frontend_pallas(
            xT, g0, h0, cs0, agc_p, taps, cp, rows=256, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(y1.re), np.asarray(yT.re).T, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(y1.im), np.asarray(yT.im).T, atol=2e-5
        )
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(h1.re), np.asarray(h2.re), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(cs1.phase), np.asarray(cs2.phase), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(cs1.freq), np.asarray(cs2.freq), atol=1e-5
        )

    def test_fused_state_chains(self, rng):
        """Two consecutive fused blocks == one double-length block, exactly."""
        from xritdemod_tpu.ops.frontend_pallas import demod_frontend_pallas

        x, taps, agc_p, cp, g0, h0, cs0 = self._setup(rng, T=2048)
        xT = CF32(x.re.T, x.im.T)
        xa = CF32(xT.re[:1024], xT.im[:1024])
        xb = CF32(xT.re[1024:], xT.im[1024:])
        run = lambda xi, g, h, cs: demod_frontend_pallas(
            xi, g, h, cs, agc_p, taps, cp, rows=256, interpret=True
        )
        ya, g, h, cs = run(xa, g0, h0, cs0)
        yb, g, h, cs = run(xb, g, h, cs)
        yf, gf, hf, csf = run(xT, g0, h0, cs0)
        np.testing.assert_array_equal(
            np.asarray(yf.re[1024:]), np.asarray(yb.re)
        )
        np.testing.assert_array_equal(np.asarray(gf), np.asarray(g))
        np.testing.assert_array_equal(np.asarray(hf.re), np.asarray(h.re))
        np.testing.assert_array_equal(
            np.asarray(csf.phase), np.asarray(cs.phase)
        )

    def test_clock_cl_matches_standard(self, rng):
        """Channels-last clock entry == standard entry, bit for bit."""
        from xritdemod_tpu.ops import clock_recovery as cr
        from xritdemod_tpu.ops.clock_pallas import (
            clock_recovery_block_pallas_batch,
            clock_recovery_block_pallas_batch_cl,
        )

        C, T = 128, 1 << 10
        t = np.arange(T)
        sig = (
            np.cos(2 * np.pi * 0.117 * t) * 0.4
            + rng.normal(0, 0.05, T)
            + 1j * rng.normal(0, 0.05, T)
        ).astype(np.complex64)
        x = CF32(
            jnp.asarray(np.tile(sig.real, (C, 1)).astype(np.float32)),
            jnp.asarray(np.tile(sig.imag, (C, 1)).astype(np.float32)),
        )
        params = cr.ClockRecoveryParams(4.2534, 3.4e-6, 0.0037, 0.005)
        ns = cr.max_symbols(T, params)
        st = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (C,) + a.shape),
            cr.clock_recovery_init(params, 0.5),
        )
        kw = dict(chunk=4, superchunks=2, ct=128, interpret=True)
        s1, v1, st1 = clock_recovery_block_pallas_batch(x, st, params, ns, **kw)
        xT = CF32(x.re.T, x.im.T)
        s2, v2, st2 = clock_recovery_block_pallas_batch_cl(
            xT, st, params, ns, **kw
        )
        np.testing.assert_array_equal(np.asarray(s1.re), np.asarray(s2.re))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fused_chain_matches_default(self, rng):
        """block_batch with the fused front-end forced (interpret on CPU)
        produces the same soft symbols and carried state as the default
        XLA path, block after block."""
        from tests.test_demod_chain import make_lrit_signal
        from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator

        C, T = 128, 2048
        cfg_f = DemodConfig.lrit(sample_rate=1_250_000,
                                 frontend_kernel="fused")
        cfg_d = DemodConfig.lrit(sample_rate=1_250_000)
        sig, _ = make_lrit_signal(rng, 2000, cfg_f)
        dm_f = Demodulator(cfg_f, block_len=T)
        dm_d = Demodulator(cfg_d, block_len=T)
        st_f = dm_f.init_state_batch(C)
        st_d = dm_d.init_state_batch(C)
        for b in range(2):
            x = np.tile(sig[b * T : (b + 1) * T], (C, 1))
            xc = CF32(jnp.asarray(x.real.astype(np.float32)),
                      jnp.asarray(x.imag.astype(np.float32)))
            soft_f, valid_f, st_f = dm_f.block_batch(xc, st_f)
            soft_d, valid_d, st_d = dm_d.block_batch(xc, st_d)
            np.testing.assert_array_equal(
                np.asarray(valid_f), np.asarray(valid_d)
            )
            np.testing.assert_allclose(
                np.asarray(soft_f), np.asarray(soft_d), atol=2e-3
            )
        np.testing.assert_allclose(
            np.asarray(st_f.agc_gain), np.asarray(st_d.agc_gain), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(st_f.clock.mu), np.asarray(st_d.clock.mu), atol=1e-3
        )
        np.testing.assert_array_equal(
            np.asarray(st_f.clock.ii), np.asarray(st_d.clock.ii)
        )

    def test_fused_block_update_chain_matches_xla_bu(self, rng):
        """Fused front-end + Pallas block-update clock (forced, interpret)
        == XLA path with the XLA block-update kernel at the same K."""
        from tests.test_demod_chain import make_lrit_signal
        from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator

        C, T = 128, 2048
        K = 4
        cfg_f = DemodConfig.lrit(sample_rate=1_250_000,
                                 frontend_kernel="fused",
                                 clock_kernel="pallas",
                                 clock_block_update=K)
        cfg_d = DemodConfig.lrit(sample_rate=1_250_000,
                                 clock_block_update=K)
        sig, _ = make_lrit_signal(rng, 2000, cfg_f)
        dm_f = Demodulator(cfg_f, block_len=T)
        dm_d = Demodulator(cfg_d, block_len=T)
        st_f = dm_f.init_state_batch(C)
        st_d = dm_d.init_state_batch(C)
        for b in range(2):
            x = np.tile(sig[b * T : (b + 1) * T], (C, 1))
            xc = CF32(jnp.asarray(x.real.astype(np.float32)),
                      jnp.asarray(x.imag.astype(np.float32)))
            soft_f, valid_f, st_f = dm_f.block_batch(xc, st_f)
            soft_d, valid_d, st_d = dm_d.block_batch(xc, st_d)
            np.testing.assert_array_equal(
                np.asarray(valid_f), np.asarray(valid_d)
            )
            np.testing.assert_allclose(
                np.asarray(soft_f), np.asarray(soft_d), atol=2e-3
            )
        np.testing.assert_array_equal(
            np.asarray(st_f.clock.ii), np.asarray(st_d.clock.ii)
        )

    def test_fused_chain_matches_default_hrit(self, rng):
        """HRIT operating point (sps ~3.236 — different clock/pad
        geometry): fused path == split XLA path."""
        from tests.test_demod_chain import make_lrit_signal
        from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator

        C, T = 128, 2048
        cfg_f = DemodConfig.hrit(sample_rate=3_000_000,
                                 frontend_kernel="fused",
                                 clock_kernel="pallas")
        cfg_d = DemodConfig.hrit(sample_rate=3_000_000)
        sig, _ = make_lrit_signal(rng, 2000, cfg_f)
        dm_f = Demodulator(cfg_f, block_len=T)
        dm_d = Demodulator(cfg_d, block_len=T)
        st_f = dm_f.init_state_batch(C)
        st_d = dm_d.init_state_batch(C)
        for b in range(2):
            x = np.tile(sig[b * T : (b + 1) * T], (C, 1))
            xc = CF32(jnp.asarray(x.real.astype(np.float32)),
                      jnp.asarray(x.imag.astype(np.float32)))
            soft_f, valid_f, st_f = dm_f.block_batch(xc, st_f)
            soft_d, valid_d, st_d = dm_d.block_batch(xc, st_d)
            np.testing.assert_array_equal(
                np.asarray(valid_f), np.asarray(valid_d)
            )
            np.testing.assert_allclose(
                np.asarray(soft_f), np.asarray(soft_d), atol=2e-3
            )
        np.testing.assert_array_equal(
            np.asarray(st_f.clock.ii), np.asarray(st_d.clock.ii)
        )

    def test_costas_block_update_k1_exact(self, rng):
        """costas_block_update degenerates to the exact recursion at K=1
        (the composed update equals one GR control_loop step when the
        freq clip doesn't bind)."""
        C, T = 4, 1024
        x = CF32(
            jnp.asarray(rng.normal(0, 0.4, (C, T)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.4, (C, T)).astype(np.float32)),
        )
        cp = costas_op.costas_gains(0.0037)
        cs0 = costas_op.costas_init((C,))
        y1, cs1 = costas_op.costas_block(x, cs0, cp)
        y2, cs2 = costas_op.costas_block_update(x, cs0, cp, chunk=1)
        np.testing.assert_allclose(
            np.asarray(y1.re), np.asarray(y2.re), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(cs1.phase), np.asarray(cs2.phase), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(cs1.freq), np.asarray(cs2.freq), atol=1e-7
        )

    def test_fused_blocked_frontend_matches_xla_twin(self, rng):
        """Fused kernel with block_k=K (interpret) == the XLA twin chain:
        affine-scan AGC + matmul FIR + costas_block_update(K)."""
        from xritdemod_tpu.ops.frontend_pallas import demod_frontend_pallas

        K = 4
        x, taps, agc_p, cp, g0, h0, cs0 = self._setup(rng)
        y1, g1 = agc_op.agc_block(x, g0, agc_p)
        y1, h1 = fir.fir_block(y1, jnp.asarray(taps), h0, method="matmul")
        y1, cs1 = costas_op.costas_block_update(y1, cs0, cp, chunk=K)
        xT = CF32(x.re.T, x.im.T)
        yT, g2, h2, cs2 = demod_frontend_pallas(
            xT, g0, h0, cs0, agc_p, taps, cp, rows=256, interpret=True,
            block_k=K,
        )
        np.testing.assert_allclose(
            np.asarray(y1.re), np.asarray(yT.re).T, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(y1.im), np.asarray(yT.im).T, atol=2e-5
        )
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(h1.re), np.asarray(h2.re), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(cs1.phase), np.asarray(cs2.phase), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(cs1.freq), np.asarray(cs2.freq), atol=1e-5
        )

    def test_fused_blocked_chain_matches_split_blocked(self, rng):
        """block_batch: fused front-end with frontend_block_update=K ==
        the split XLA path with the same K, block after block."""
        from tests.test_demod_chain import make_lrit_signal
        from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator

        C, T = 128, 2048
        K = 8
        cfg_f = DemodConfig.lrit(sample_rate=1_250_000,
                                 frontend_kernel="fused",
                                 clock_kernel="pallas",
                                 frontend_block_update=K)
        cfg_d = DemodConfig.lrit(sample_rate=1_250_000,
                                 frontend_block_update=K)
        sig, _ = make_lrit_signal(rng, 2000, cfg_f)
        dm_f = Demodulator(cfg_f, block_len=T)
        dm_d = Demodulator(cfg_d, block_len=T)
        st_f = dm_f.init_state_batch(C)
        st_d = dm_d.init_state_batch(C)
        for b in range(2):
            x = np.tile(sig[b * T : (b + 1) * T], (C, 1))
            xc = CF32(jnp.asarray(x.real.astype(np.float32)),
                      jnp.asarray(x.imag.astype(np.float32)))
            soft_f, valid_f, st_f = dm_f.block_batch(xc, st_f)
            soft_d, valid_d, st_d = dm_d.block_batch(xc, st_d)
            np.testing.assert_array_equal(
                np.asarray(valid_f), np.asarray(valid_d)
            )
            np.testing.assert_allclose(
                np.asarray(soft_f), np.asarray(soft_d), atol=2e-3
            )
        np.testing.assert_array_equal(
            np.asarray(st_f.clock.ii), np.asarray(st_d.clock.ii)
        )


class TestFirMatmul:
    def test_matmul_matches_conv(self, rng):
        from xritdemod_tpu.ops import fir

        taps = jnp.asarray(rng.normal(size=63).astype(np.float32))
        x = rng.normal(size=(3, 2048)).astype(np.float32)
        h = rng.normal(size=(3, 62)).astype(np.float32)
        y1, h1 = fir.fir_block_real(jnp.asarray(x), taps, jnp.asarray(h))
        y2, h2 = fir.fir_block_real_matmul(jnp.asarray(x), taps, jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    def test_matmul_chains_blocks(self, rng):
        """History carry: two matmul blocks == one conv run."""
        from xritdemod_tpu.ops import fir

        taps = jnp.asarray(rng.normal(size=31).astype(np.float32))
        x = rng.normal(size=(2, 1024)).astype(np.float32)
        full, _ = fir.fir_block_real(jnp.asarray(x), taps, jnp.zeros((2, 30)))
        h = jnp.zeros((2, 30))
        y1, h = fir.fir_block_real_matmul(jnp.asarray(x[:, :512]), taps, h)
        y2, _ = fir.fir_block_real_matmul(jnp.asarray(x[:, 512:]), taps, h)
        got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
        np.testing.assert_allclose(np.asarray(full), got, atol=2e-5)


class TestClockSegmentation:
    """clock_max_block segmentation: chained per-segment clock launches are
    bit-identical to one whole-block launch (ADVICE r1: the segs>1 path was
    merged with zero coverage)."""

    def _run(self, rng, cfg, C=128, T=2048):
        from tests.test_demod_chain import make_lrit_signal
        from xritdemod_tpu.models.demodulator import Demodulator

        sig, _ = make_lrit_signal(rng, 1000, cfg)
        dm = Demodulator(cfg, block_len=T)
        st = dm.init_state_batch(C)
        outs = []
        for b in range(2):
            x = np.tile(sig[b * T : (b + 1) * T], (C, 1))
            xc = CF32(jnp.asarray(x.real.astype(np.float32)),
                      jnp.asarray(x.imag.astype(np.float32)))
            soft, valid, st = dm.block_batch(xc, st)
            outs.append((np.asarray(soft), np.asarray(valid)))
        return dm, outs, st

    def _assert_valid_equal(self, outs_a, outs_b):
        for (sa, va), (sb, vb) in zip(outs_a, outs_b):
            assert va.sum() == vb.sum()
            for c in range(sa.shape[0]):
                np.testing.assert_array_equal(sa[c][va[c]], sb[c][vb[c]])

    def test_fused_segmented_bit_identical(self, rng):
        """Fused front-end (interpret) + clock_max_block forcing segs=4 ==
        the unsegmented fused path, soft[valid] bit for bit."""
        from xritdemod_tpu.models.demodulator import DemodConfig

        base = dict(sample_rate=1_250_000, frontend_kernel="fused",
                    clock_kernel="pallas")
        dm_s, outs_s, st_s = self._run(
            rng, DemodConfig.lrit(clock_max_block=512, **base))
        rng2 = np.random.default_rng(1234)
        dm_u, outs_u, st_u = self._run(rng2, DemodConfig.lrit(**base))
        assert dm_s._clock_segs == 4 and dm_u._clock_segs == 1
        self._assert_valid_equal(outs_s, outs_u)
        np.testing.assert_array_equal(
            np.asarray(st_s.clock.mu), np.asarray(st_u.clock.mu))
        np.testing.assert_array_equal(
            np.asarray(st_s.clock.omega), np.asarray(st_u.clock.omega))

    def test_split_pallas_segmented_bit_identical(self, rng):
        """Split-kernel Pallas clock path segments the same way (ADVICE r1:
        clock_max_block previously governed only the fused path)."""
        from xritdemod_tpu.models.demodulator import DemodConfig

        base = dict(sample_rate=1_250_000, frontend_kernel="split",
                    clock_kernel="pallas")
        dm_s, outs_s, st_s = self._run(
            rng, DemodConfig.lrit(clock_max_block=1024, **base))
        rng2 = np.random.default_rng(1234)
        dm_u, outs_u, st_u = self._run(rng2, DemodConfig.lrit(**base))
        assert dm_s._clock_segs == 2 and dm_u._clock_segs == 1
        self._assert_valid_equal(outs_s, outs_u)
        np.testing.assert_array_equal(
            np.asarray(st_s.clock.mu), np.asarray(st_u.clock.mu))

    def test_non_divisible_cap_falls_back(self):
        """A cap that doesn't divide the block picks the next segment count
        whose equal split fits under it (never silently ignored)."""
        from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator

        dm = Demodulator(
            DemodConfig.lrit(sample_rate=1_250_000, clock_max_block=768),
            block_len=2048,
        )
        assert dm._clock_segs == 4          # 2048/3 doesn't divide; 4 does
        assert dm.num_slots % dm._clock_segs == 0

    def test_wrong_block_len_raises(self, rng):
        from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator

        dm = Demodulator(DemodConfig.lrit(sample_rate=1_250_000),
                         block_len=2048)
        st = dm.init_state_batch(4)
        x = CF32(jnp.zeros((4, 1024)), jnp.zeros((4, 1024)))
        st4 = jax.tree.map(lambda a: a[:4], st)
        with pytest.raises(ValueError, match="block_len"):
            dm.block_batch(x, st4)


class TestFrontendFirInplace:
    def test_inplace_fir_bit_identical(self, rng):
        """fir_inplace=True (the G>=32 VMEM-saving mode) == the dedicated-
        scratch mode, bit for bit (interpret)."""
        from xritdemod_tpu.ops import filters
        from xritdemod_tpu.ops import agc as agc_op
        from xritdemod_tpu.ops import costas as costas_op
        from xritdemod_tpu.ops import fir
        from xritdemod_tpu.ops.frontend_pallas import demod_frontend_pallas

        C, T = 128, 1024
        x = CF32(
            jnp.asarray(rng.normal(0, 0.3, (T, C)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.3, (T, C)).astype(np.float32)),
        )
        taps = tuple(
            float(v)
            for v in filters.rrc_taps(1.0, 1_250_000, 293_883, 0.5, 63)
        )
        agc_p = agc_op.AgcParams()
        cp = costas_op.costas_gains(0.0037)
        g0 = agc_op.agc_init(agc_p, (C,))
        h0 = fir.fir_init(len(taps), (C,))
        cs0 = costas_op.costas_init((C,))
        run = lambda ip: demod_frontend_pallas(
            x, g0, h0, cs0, agc_p, taps, cp, rows=256, interpret=True,
            block_k=8, fir_inplace=ip,
        )
        ya, ga, ha, ca = run(False)
        yb, gb, hb, cb = run(True)
        np.testing.assert_array_equal(np.asarray(ya.re), np.asarray(yb.re))
        np.testing.assert_array_equal(np.asarray(ya.im), np.asarray(yb.im))
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
        np.testing.assert_array_equal(np.asarray(ha.re), np.asarray(hb.re))
        np.testing.assert_array_equal(
            np.asarray(ca.phase), np.asarray(cb.phase)
        )


class TestAgcExactClamp:
    """The max-gain clamp is exact in every parallel AGC form (VERDICT r1
    weak #3: it used to bind only pointwise on scanned gains)."""

    def _cold_start(self, T, mg):
        p = agc_op.AgcParams(rate=0.01, reference=0.5, gain=1.0, max_gain=mg)
        amp = np.concatenate(
            [np.full(T // 2, 1e-4), np.full(T - T // 2, 0.7)]
        )
        n = np.arange(T)
        x = CF32(
            jnp.asarray((amp * np.cos(n)).astype(np.float32)),
            jnp.asarray((amp * np.sin(n)).astype(np.float32)),
        )
        return p, x

    def test_scan_matches_sequential_while_clamped(self):
        """Cold start on near-zero signal: the clamp binds hard mid-block,
        then the signal appears and gains decay — the associative-scan
        form now tracks the sequential recursion through all of it."""
        for mg, T, tol in ((5.0, 2048, 2e-5), (3.0, 131072, 1e-3)):
            p, x = self._cold_start(T, mg)
            g0 = agc_op.agc_init(p)
            y1, ng1 = agc_op.agc_block_exact(x, g0, p)
            y2, ng2 = agc_op.agc_block(x, g0, p)
            err = float(np.max(np.abs(np.asarray(y1.re) - np.asarray(y2.re))))
            assert err / mg < tol, (mg, T, err)
            np.testing.assert_allclose(
                float(ng1), float(ng2), rtol=1e-4
            )

    def test_fused_slab_matches_sequential_while_clamped(self):
        """The fused front-end's K-slab AGC threads the clamp through the
        slab recursion exactly (in-slab restart-candidate min)."""
        from xritdemod_tpu.ops import filters
        from xritdemod_tpu.ops import costas as costas_op
        from xritdemod_tpu.ops import fir
        from xritdemod_tpu.ops.frontend_pallas import demod_frontend_pallas

        C_, T, mg = 128, 1024, 5.0
        p = agc_op.AgcParams(rate=0.01, reference=0.5, gain=1.0, max_gain=mg)
        amp = np.concatenate(
            [np.full(T // 2, 1e-4), np.full(T - T // 2, 0.7)]
        )
        n = np.arange(T)
        sig = (amp * np.cos(n)).astype(np.float32)
        sgi = (amp * np.sin(n)).astype(np.float32)
        x = CF32(jnp.asarray(np.tile(sig, (C_, 1))),
                 jnp.asarray(np.tile(sgi, (C_, 1))))
        g0 = agc_op.agc_init(p, (C_,))
        y_ref, g_ref = agc_op.agc_block_exact(x, g0, p)

        taps = tuple(
            float(v)
            for v in filters.rrc_taps(1.0, 1_250_000, 293_883, 0.5, 63)
        )
        cp = costas_op.costas_gains(0.0037)
        xT = CF32(x.re.T, x.im.T)
        _, g_f, h_f, _ = demod_frontend_pallas(
            xT, g0, fir.fir_init(len(taps), (C_,)), costas_op.costas_init((C_,)),
            p, taps, cp, rows=256, interpret=True, block_k=8,
        )
        # Carried gain matches the exact recursion, and the FIR history
        # rows (the last 62 AGC outputs) match the exact AGC outputs.
        np.testing.assert_allclose(
            np.asarray(g_f), np.asarray(g_ref), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(h_f.re), np.asarray(y_ref.re[:, -62:]), atol=1e-4
        )
