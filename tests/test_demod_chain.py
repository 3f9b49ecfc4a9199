"""End-to-end demod chain: locks on synthetic RRC-shaped BPSK with carrier
offset, matching the operating point of BASELINE.json config 1 (LRIT)."""

import jax.numpy as jnp
import numpy as np

from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator, quantize_symbols
from xritdemod_tpu.ops import filters
import pytest

# Compile-heavy on XLA:CPU -- excluded from the quick tier (build.sh).
pytestmark = pytest.mark.heavy


def make_lrit_signal(rng, nsym, cfg, f_off=2e-4, phase=0.7, amp=0.25, noise=0.02):
    sps = cfg.sps
    os_factor = 8
    ntaps = 127
    bits = rng.integers(0, 2, nsym)
    syms = 1.0 - 2.0 * bits.astype(np.float64)
    fine_len = int(nsym * sps * os_factor) + ntaps * os_factor
    impulses = np.zeros(fine_len)
    pos = (np.arange(nsym) * sps * os_factor).astype(np.int64)
    impulses[pos] = syms
    fine_rate = cfg.circuit_sample_rate * os_factor
    rc = filters.rrc_taps(1.0, fine_rate, cfg.symbol_rate, cfg.rrc_alpha, ntaps * os_factor)
    shaped = np.convolve(impulses, rc.astype(np.float64) * os_factor, mode="same")
    sig = shaped[::os_factor].astype(np.complex128)
    n = np.arange(len(sig))
    sig = sig * np.exp(1j * (2 * np.pi * f_off * n + phase)) * amp
    sig = sig + (rng.normal(size=len(sig)) + 1j * rng.normal(size=len(sig))) * noise
    return sig.astype(np.complex64), bits


def test_lrit_chain_locks(rng):
    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    sig, bits = make_lrit_signal(rng, 60_000, cfg)
    T = 1 << 16
    demod = Demodulator(cfg, block_len=T)
    state = demod.init_state()
    outs = []
    for b in range(len(sig) // T):
        soft, valid, state = demod.process(jnp.asarray(sig[b * T : (b + 1) * T]), state)
        outs.append(np.asarray(soft)[np.asarray(valid)])
    soft = np.concatenate(outs)
    # symbol count within slack of consumed/sps
    consumed = (len(sig) // T) * T
    assert abs(len(soft) - consumed / cfg.sps) < 50
    # after convergence, clean bimodal eye near AGC reference
    tail = soft[len(soft) // 2 :]
    eye = np.abs(tail).mean() / np.abs(tail).std()
    assert eye > 4.0
    assert 0.3 < np.abs(tail).mean() < 0.7
    # hard decisions match tx bits (allow polarity flip + offset)
    start = len(soft) // 2
    got = (tail[:4000] < 0).astype(int)
    best = 0
    for off in range(-30, 31):
        w = bits[start + off : start + off + len(got)]
        n = min(len(w), len(got))
        agree = max((got[:n] == w[:n]).mean(), (got[:n] != w[:n]).mean())
        best = max(best, agree)
    assert best > 0.999


def test_quantize_symbols():
    q = quantize_symbols(jnp.asarray([0.5, -0.5, 2.0, -2.0, 0.0]))
    np.testing.assert_array_equal(np.asarray(q), [63, -63, 127, -128, 0])


class TestBlockUpdateClock:
    """The K-symbol block-update M&M variant (clock_block_update=K) must
    degenerate to the exact kernel at K=1 and keep the chain's post-FEC
    bit-exactness at the production K."""

    def _batch(self, sig, C):
        from xritdemod_tpu.utils.cplx import CF32

        return CF32(
            jnp.asarray(np.tile(sig.real, (C, 1)).astype(np.float32)),
            jnp.asarray(np.tile(sig.imag, (C, 1)).astype(np.float32)),
        )

    def test_k1_degenerates_to_exact(self, rng):
        import jax

        from xritdemod_tpu.ops import clock_recovery as cr

        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        sig, _ = make_lrit_signal(rng, 9_000, cfg)
        T = 1 << 15
        x = self._batch(sig[:T], 2)
        params = cr.ClockRecoveryParams(
            omega=cfg.sps,
            gain_omega=cfg.clock_alpha**2 / 4,
            gain_mu=cfg.clock_alpha,
            omega_relative_limit=cfg.clock_omega_limit,
        )
        ns = cr.max_symbols(T, params)
        st = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (2,) + a.shape),
            cr.clock_recovery_init(params, cfg.clock_mu),
        )
        s_ex, v_ex, st_ex = cr.clock_recovery_block_batch(x, st, params, ns)
        s_k1, v_k1, st_k1 = cr.clock_recovery_block_update_batch(
            x, st, params, ns, chunk=1
        )
        # identical clock trajectory (ii/valid bit-equal; mu to within one
        # float association-order ulp)
        np.testing.assert_allclose(
            np.asarray(st_ex.mu), np.asarray(st_k1.mu), atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(st_ex.ii), np.asarray(st_k1.ii))
        np.testing.assert_array_equal(np.asarray(v_ex), np.asarray(v_k1))
        # … and symbols equal to float reduction order
        np.testing.assert_allclose(
            np.asarray(s_ex.re), np.asarray(s_k1.re), atol=1e-5
        )

    def test_k16_chain_decodes_bit_exact(self, rng):
        """RF in -> block-update demod -> decode: VCDU payloads bit-exact."""
        from xritdemod_tpu import tx
        from xritdemod_tpu.models.decoder import DecoderConfig, StreamDecoder
        from xritdemod_tpu.parallel.channels import ChannelDemodulator

        cfg = DemodConfig.lrit(sample_rate=1_250_000, clock_block_update=16)
        nframes = 6
        vcdus = tx.make_vcdus(nframes, scid=13, vcid=5, rng=rng)
        symbols = tx.encode_stream(vcdus, lrit=True)

        sps = cfg.sps
        os_factor = 4
        ntaps = 127
        nsym = len(symbols)
        fine_len = int(nsym * sps * os_factor) + ntaps * os_factor
        impulses = np.zeros(fine_len)
        pos = (np.arange(nsym) * sps * os_factor).astype(np.int64)
        impulses[pos] = symbols
        fine_rate = cfg.circuit_sample_rate * os_factor
        rc = filters.rrc_taps(
            1.0, fine_rate, cfg.symbol_rate, cfg.rrc_alpha, ntaps * os_factor
        )
        shaped = np.convolve(impulses, rc.astype(np.float64) * os_factor, mode="same")
        sig = shaped[::os_factor].astype(np.complex128)
        n = np.arange(len(sig))
        sig = sig * np.exp(1j * (2 * np.pi * 1e-4 * n + 0.4)) * 0.3
        sig += (rng.normal(size=len(sig)) + 1j * rng.normal(size=len(sig))) * 0.01
        sig = sig.astype(np.complex64)

        C, T = 2, 1 << 16
        demod = ChannelDemodulator(cfg, channels=C, block_len=T)
        state = demod.init_state()
        dec = StreamDecoder(DecoderConfig(mode="lrit", frames_per_block=2))
        got = []
        for b in range(len(sig) // T):
            x = self._batch(sig[b * T : (b + 1) * T], C)
            soft, valid, state = demod.process(x, state)
            s0 = np.asarray(soft[0])[np.asarray(valid[0])]
            for batch in dec.push(s0):
                ok = np.asarray(batch.frame_ok)
                got.extend(np.asarray(batch.vcdu)[ok])
        for batch in dec.flush():
            ok = np.asarray(batch.frame_ok)
            got.extend(np.asarray(batch.vcdu)[ok])

        # allow acquisition transient to lose leading frames; all decoded
        # frames must be bit-exact copies of transmitted VCDUs
        assert len(got) >= nframes - 2
        sent = {bytes(v) for v in vcdus}
        for v in got:
            assert bytes(v) in sent

    def test_frontend_k8_chain_decodes_bit_exact(self, rng):
        """RF in -> demod with the K-row blocked front-end (AGC affine
        prefix + frozen-ramp Costas, frontend_block_update=8) -> decode:
        VCDU payloads bit-exact."""
        from xritdemod_tpu import tx
        from xritdemod_tpu.models.decoder import DecoderConfig, StreamDecoder
        from xritdemod_tpu.parallel.channels import ChannelDemodulator

        cfg = DemodConfig.lrit(sample_rate=1_250_000,
                               frontend_block_update=8)
        nframes = 6
        vcdus = tx.make_vcdus(nframes, scid=13, vcid=5, rng=rng)
        symbols = tx.encode_stream(vcdus, lrit=True)

        sps = cfg.sps
        os_factor = 4
        ntaps = 127
        nsym = len(symbols)
        fine_len = int(nsym * sps * os_factor) + ntaps * os_factor
        impulses = np.zeros(fine_len)
        pos = (np.arange(nsym) * sps * os_factor).astype(np.int64)
        impulses[pos] = symbols
        fine_rate = cfg.circuit_sample_rate * os_factor
        rc = filters.rrc_taps(
            1.0, fine_rate, cfg.symbol_rate, cfg.rrc_alpha, ntaps * os_factor
        )
        shaped = np.convolve(
            impulses, rc.astype(np.float64) * os_factor, mode="same"
        )
        sig = shaped[::os_factor].astype(np.complex128)
        n = np.arange(len(sig))
        sig = sig * np.exp(1j * (2 * np.pi * 1e-4 * n + 0.4)) * 0.3
        sig += (
            rng.normal(size=len(sig)) + 1j * rng.normal(size=len(sig))
        ) * 0.01
        sig = sig.astype(np.complex64)

        C, T = 2, 1 << 16
        demod = ChannelDemodulator(cfg, channels=C, block_len=T)
        state = demod.init_state()
        dec = StreamDecoder(DecoderConfig(mode="lrit", frames_per_block=2))
        got = []
        for b in range(len(sig) // T):
            x = self._batch(sig[b * T : (b + 1) * T], C)
            soft, valid, state = demod.process(x, state)
            s0 = np.asarray(soft[0])[np.asarray(valid[0])]
            for batch in dec.push(s0):
                ok = np.asarray(batch.frame_ok)
                got.extend(np.asarray(batch.vcdu)[ok])
        for batch in dec.flush():
            ok = np.asarray(batch.frame_ok)
            got.extend(np.asarray(batch.vcdu)[ok])

        assert len(got) >= nframes - 2
        sent = {bytes(v) for v in vcdus}
        for v in got:
            assert bytes(v) in sent

    def test_block_batch_cl_matches_row_major(self, rng):
        """Channels-last ingest (block_batch_cl on a (T, C) block) is
        bit-identical to block_batch on the transposed (C, T) block —
        both through the forced-fused path (the TPU default, interpret
        mode here) and through the CPU fallback."""
        from xritdemod_tpu.utils.cplx import CF32

        C, T = 128, 2048
        for kernel in ("fused", "auto"):
            cfg = DemodConfig.lrit(sample_rate=1_250_000,
                                   frontend_kernel=kernel)
            dm = Demodulator(cfg, block_len=T)
            st_r = dm.init_state_batch(C)
            st_c = dm.init_state_batch(C)
            sig, _ = make_lrit_signal(rng, 2000, cfg)
            for b in range(2):
                x = np.tile(sig[b * T : (b + 1) * T], (C, 1))
                xc = CF32(jnp.asarray(x.real.astype(np.float32)),
                          jnp.asarray(x.imag.astype(np.float32)))
                xt = CF32(jnp.asarray(x.real.astype(np.float32).T.copy()),
                          jnp.asarray(x.imag.astype(np.float32).T.copy()))
                soft_r, valid_r, st_r = dm.block_batch(xc, st_r)
                soft_c, valid_c, st_c = dm.block_batch_cl(xt, st_c)
                np.testing.assert_array_equal(
                    np.asarray(valid_r), np.asarray(valid_c)
                )
                np.testing.assert_array_equal(
                    np.asarray(soft_r), np.asarray(soft_c)
                )

    def test_frontend_bf16_rrc_matches_exact_symbols(self, rng):
        """Fused front-end with bf16 RRC matmul operands
        (frontend_precision="bf16", the MXU single-pass form) vs exact
        f32: same clock trajectory and valid mask, soft symbols within
        the bf16 mantissa bound — i.e. well inside the int8 quantizer
        LSB (1/127), so the downstream coded stream is unchanged.
        (Post-FEC bit-exactness of the full bf16 TPU path is verified
        on-device by tools/drive_fused_tpu.py.)"""
        from xritdemod_tpu.utils.cplx import CF32

        C, T = 128, 2048
        cfg_b = DemodConfig.lrit(sample_rate=1_250_000,
                                 frontend_kernel="fused",
                                 frontend_precision="bf16")
        cfg_h = DemodConfig.lrit(sample_rate=1_250_000,
                                 frontend_kernel="fused",
                                 frontend_precision="highest")
        sig, _ = make_lrit_signal(rng, 2000, cfg_b)
        dm_b = Demodulator(cfg_b, block_len=T)
        dm_h = Demodulator(cfg_h, block_len=T)
        st_b = dm_b.init_state_batch(C)
        st_h = dm_h.init_state_batch(C)
        for b in range(2):
            x = np.tile(sig[b * T : (b + 1) * T], (C, 1))
            xc = CF32(jnp.asarray(x.real.astype(np.float32)),
                      jnp.asarray(x.imag.astype(np.float32)))
            soft_b, valid_b, st_b = dm_b.block_batch(xc, st_b)
            soft_h, valid_h, st_h = dm_h.block_batch(xc, st_h)
            np.testing.assert_array_equal(
                np.asarray(valid_b), np.asarray(valid_h)
            )
            np.testing.assert_allclose(
                np.asarray(soft_b), np.asarray(soft_h), atol=4e-3
            )
        np.testing.assert_array_equal(
            np.asarray(st_b.clock.ii), np.asarray(st_h.clock.ii)
        )


def test_snr_estimate_tracks_true_snr(rng):
    """The GR-prototype RMS-ratio figure (in-band S+N over out-of-band N,
    demod_tcp_qt.py:263-298) is a RELATIVE link-quality indicator, not a
    calibrated Es/N0: it must be strictly monotone in true SNR and track
    dB-for-dB in the high-SNR regime."""
    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    dm = Demodulator(cfg, block_len=1 << 16)
    state = dm.init_state()
    ests = []
    for target_db in (6.0, 10.0, 14.0, 20.0):
        noise = 0.25 * 10 ** (-target_db / 20)
        sig, _ = make_lrit_signal(
            rng, 18_000, cfg, amp=0.25, noise=noise / np.sqrt(2)
        )
        ests.append(
            float(np.asarray(dm.snr_estimate(sig[: 1 << 16], state)))
        )
    assert ests == sorted(ests), ests
    assert ests[-1] - ests[0] > 8.0, ests          # wide dynamic range
    assert 4.0 < ests[-1] - ests[-2] < 8.0, ests   # ~dB-for-dB when clean
