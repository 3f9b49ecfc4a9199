"""GR-parity tabulated MMSE interpolator clock mode (clock_interp="mmse").

Round-4 VERDICT item 4: the reference's golden model interpolates with GR
`mmse_fir_interpolator_cc` (demod_tcp_qt.py:266) — a 129-row 8-tap table
indexed by quantized mu — while the default mode here evaluates windowed
sinc taps at the exact mu.  These tests pin the regenerated table's
mathematical properties, the cross-kernel agreement (serial == batch ==
Pallas) under the new mode, and end-to-end lock.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu.ops import clock_recovery as cr_op
from xritdemod_tpu.ops.interp_taps import NSTEPS, NTAPS, mmse_taps_table
from xritdemod_tpu.utils.cplx import CF32, from_complex


from tests.test_dsp_ops import _shaped_bpsk  # noqa: E402


class TestTable:
    def test_shape_and_endpoints(self):
        t = mmse_taps_table()
        assert t.shape == (NSTEPS + 1, NTAPS)
        # mu = 0 resolves delay 3 exactly; mu = 1 delay 4.
        np.testing.assert_allclose(t[0], np.eye(NTAPS)[3], atol=1e-6)
        np.testing.assert_allclose(t[NSTEPS], np.eye(NTAPS)[4], atol=1e-6)

    def test_mirror_symmetry(self):
        # h_k(1 - mu) == h_{7-k}(mu): the MMSE criterion is symmetric
        # around the center of the 8-tap span.
        t = mmse_taps_table()
        np.testing.assert_allclose(t[::-1], t[:, ::-1], atol=1e-6)

    def test_rows_near_unity_gain(self):
        s = mmse_taps_table().sum(axis=1)
        np.testing.assert_allclose(s, 1.0, atol=1e-3)

    def test_interpolates_bandlimited_signal(self):
        # On a signal within the design band (B = 0.25), table
        # interpolation at mu must closely match the exact delayed value.
        t = mmse_taps_table()
        n = np.arange(64, dtype=np.float64)
        f = 0.11
        x = np.cos(2 * np.pi * f * n + 0.3)
        for i in (16, 33, 64, 100):
            mu = i / NSTEPS
            est = float(np.dot(t[i], x[20 : 20 + NTAPS]))
            ref = np.cos(2 * np.pi * f * (20 + 3 + mu) + 0.3)
            assert abs(est - ref) < 2e-4, (mu, est, ref)


class TestKernelsAgree:
    def _params(self, sps=4.2534):
        return cr_op.ClockRecoveryParams(
            omega=sps, gain_omega=0.0037**2 / 4, gain_mu=0.0037
        )

    def test_serial_recovers_symbols_mmse(self, rng):
        params = self._params()
        sig, bits = _shaped_bpsk(rng, 4000, params.omega)
        nslots = cr_op.max_symbols(len(sig), params)
        syms, valid, _ = cr_op.clock_recovery_block(
            from_complex(sig), cr_op.clock_recovery_init(params), params,
            nslots, interp="mmse",
        )
        soft = np.asarray(syms.re)[np.asarray(valid)]
        start = 2500
        got = (soft[start : start + 1200] < 0).astype(int)
        best = 0
        for off in range(-8, 9):
            w = bits[start + off : start + off + len(got)]
            agree = max((got == w).mean(), (got != w).mean())
            best = max(best, agree)
        assert best > 0.999

    def test_batch_matches_vmap_serial_mmse(self, rng):
        params = self._params()
        sig, _ = _shaped_bpsk(rng, 800, params.omega)
        C = 4
        batch = from_complex(np.stack([sig] * C))
        nslots = cr_op.max_symbols(len(sig), params)
        init = jax.vmap(lambda _: cr_op.clock_recovery_init(params))(
            jnp.arange(C)
        )
        s_v, v_v, st_v = jax.vmap(
            lambda x, s: cr_op.clock_recovery_block(
                x, s, params, nslots, interp="mmse"
            )
        )(batch, init)
        s_b, v_b, st_b = cr_op.clock_recovery_block_batch(
            batch, init, params, nslots, interp="mmse"
        )
        np.testing.assert_array_equal(np.asarray(v_v), np.asarray(v_b))
        np.testing.assert_array_equal(
            np.asarray(st_v.ii), np.asarray(st_b.ii)
        )
        np.testing.assert_allclose(
            np.asarray(s_v.re), np.asarray(s_b.re), atol=1e-6
        )

    def test_pallas_matches_xla_mmse_interpret(self, rng):
        from xritdemod_tpu.ops.clock_pallas import (
            clock_recovery_block_pallas_batch,
        )

        params = self._params(sps=4.2534)
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
        ns = cr_op.max_symbols(T, params)
        st = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (C,) + a.shape),
            cr_op.clock_recovery_init(params),
        )
        s_ex, v_ex, st_ex = cr_op.clock_recovery_block_batch(
            x, st, params, ns, chunk=4, superchunks=2, interp="mmse"
        )
        s_pl, v_pl, st_pl = clock_recovery_block_pallas_batch(
            x, st, params, ns, chunk=4, superchunks=2, ct=128,
            interpret=True, interp_mode="mmse",
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

    def test_block_update_pallas_matches_xla_mmse(self, rng):
        from xritdemod_tpu.ops.clock_pallas import (
            clock_recovery_block_pallas_batch,
        )

        params = self._params()
        T, C = 1 << 10, 128
        sig, _ = _shaped_bpsk(rng, int(T / params.omega) + 8, params.omega)
        sig = sig[:T]
        x = CF32(
            jnp.asarray(np.tile(sig.real, (C, 1)).astype(np.float32)),
            jnp.asarray(np.tile(sig.imag, (C, 1)).astype(np.float32)),
        )
        ns = cr_op.max_symbols(T, params)
        st = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (C,) + a.shape),
            cr_op.clock_recovery_init(params),
        )
        s_x, v_x, st_x = cr_op.clock_recovery_block_update_batch(
            x, st, params, ns, chunk=4, superchunks=2, interp="mmse"
        )
        s_p, v_p, st_p = clock_recovery_block_pallas_batch(
            x, st, params, ns, chunk=4, superchunks=2, ct=128,
            interpret=True, block_update=True, interp_mode="mmse",
        )
        np.testing.assert_array_equal(np.asarray(v_x), np.asarray(v_p))
        np.testing.assert_array_equal(
            np.asarray(st_x.ii), np.asarray(st_p.ii)
        )
        np.testing.assert_allclose(
            np.asarray(s_x.re), np.asarray(s_p.re), atol=1e-6
        )


class TestEndToEnd:
    def test_demod_chain_locks_mmse(self, rng):
        from tests.test_demod_chain import make_lrit_signal
        from xritdemod_tpu.models.demodulator import (
            DemodConfig, Demodulator,
        )

        cfg = DemodConfig.lrit(sample_rate=1_250_000, clock_interp="mmse")
        dm = Demodulator(cfg, block_len=1 << 16)
        sig, _ = make_lrit_signal(rng, 16000, cfg)
        st = dm.init_state()
        soft = []
        T = 1 << 16
        for b in range(len(sig) // T):
            s, v, st = dm.process(sig[b * T : (b + 1) * T], st)
            soft.append(np.asarray(s)[np.asarray(v)])
        soft = np.concatenate(soft)
        tail = soft[len(soft) // 2 :]
        eye = np.abs(tail).mean() / (np.abs(np.abs(tail) - np.abs(tail).mean()).mean() + 1e-9)
        assert eye > 4.0
        assert 0.3 < np.abs(tail).mean() < 0.7

    def test_invalid_interp_raises(self):
        import pytest

        from xritdemod_tpu.models.demodulator import (
            DemodConfig, Demodulator,
        )

        with pytest.raises(ValueError, match="clock_interp"):
            Demodulator(DemodConfig.lrit(clock_interp="cubic"))

    def test_config_key_parses(self, tmp_path):
        from xritdemod_tpu.runtime.config import demod_config_from_file

        f = tmp_path / "xritdemod.cfg"
        f.write_text("mode=lrit\nclockInterp=mmse\n")
        cfg, _ = demod_config_from_file(str(f))
        assert cfg.clock_interp == "mmse"
