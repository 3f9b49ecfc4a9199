"""Golden tests for GR-firdes-compatible tap design."""

import numpy as np

from xritdemod_tpu.ops import filters


def analytic_rrc(t, Ts, alpha):
    """Textbook root-raised-cosine impulse response h(t), Ts = symbol period."""
    t = np.asarray(t, dtype=np.float64)
    h = np.zeros_like(t)
    for i, ti in enumerate(t):
        x = ti / Ts
        if abs(ti) < 1e-12:
            h[i] = (1.0 + alpha * (4.0 / np.pi - 1.0)) / Ts
        elif abs(abs(ti) - Ts / (4 * alpha)) < 1e-9:
            h[i] = (
                alpha
                / (Ts * np.sqrt(2))
                * (
                    (1 + 2 / np.pi) * np.sin(np.pi / (4 * alpha))
                    + (1 - 2 / np.pi) * np.cos(np.pi / (4 * alpha))
                )
            )
        else:
            num = np.sin(np.pi * x * (1 - alpha)) + 4 * alpha * x * np.cos(
                np.pi * x * (1 + alpha)
            )
            den = np.pi * x * (1 - (4 * alpha * x) ** 2)
            h[i] = num / den / Ts
    return h


def test_rrc_matches_analytic_shape():
    fs, sym, alpha, ntaps = 1_250_000.0, 293_883.0, 0.5, 63
    taps = filters.rrc_taps(1.0, fs, sym, alpha, ntaps).astype(np.float64)
    n = np.arange(ntaps) - ntaps // 2
    ref = analytic_rrc(n / fs, 1.0 / sym, alpha)
    # shape identical up to scale
    corr = np.dot(taps, ref) / (np.linalg.norm(taps) * np.linalg.norm(ref))
    assert corr > 0.99999
    # firdes normalization: sum(taps) == gain
    assert abs(taps.sum() - 1.0) < 1e-5


def test_rrc_symmetry_and_oddness():
    taps = filters.rrc_taps(1.0, 3e6, 927000.0, 0.3, 63)
    assert taps.shape[0] == 63
    np.testing.assert_allclose(taps, taps[::-1], rtol=1e-6)
    taps_even_req = filters.rrc_taps(1.0, 3e6, 927000.0, 0.3, 62)
    assert taps_even_req.shape[0] == 63  # ntaps |= 1


def test_lowpass_dc_gain_and_cutoff():
    fs, cutoff, trans = 2_500_000.0, 625_000.0, 100e3
    taps = filters.lowpass_taps(1.0, fs, cutoff, trans).astype(np.float64)
    # GR compute_ntaps with 53 dB Hamming
    assert taps.shape[0] == filters.compute_ntaps(fs, trans)
    assert taps.shape[0] % 2 == 1
    # DC gain exactly 1
    assert abs(taps.sum() - 1.0) < 1e-6
    # frequency response: passband flat, stopband attenuated
    w = np.fft.rfftfreq(8192, 1 / fs)
    H = np.abs(np.fft.rfft(taps, 8192))
    passband = H[w < cutoff * 0.8]
    stopband = H[w > cutoff + trans]
    assert np.all(passband > 0.98)
    assert np.all(stopband < 10 ** (-40 / 20))  # >40 dB down


class TestHighpass:
    def test_highpass_response(self):
        """Blackman windowed-sinc HPF (firdes.high_pass semantics): unity
        at Nyquist, deep null at DC, cutoff respected."""
        from xritdemod_tpu.ops.filters import highpass_taps

        fs, cutoff = 1_250_000.0, 293_883.0
        taps = highpass_taps(1.0, fs, cutoff, 300e3).astype(np.float64)
        assert len(taps) % 2 == 1
        # frequency response at DC, cutoff-ish band, and Nyquist
        w = np.fft.rfftfreq(8192, 1 / fs)
        H = np.abs(np.fft.rfft(taps, 8192))
        assert H[0] < 1e-3                      # DC null
        assert abs(H[-1] - 1.0) < 1e-3          # unity at Nyquist
        assert H[w < cutoff - 200e3].max() < 0.05   # stopband
        assert H[w > cutoff + 200e3].min() > 0.9    # passband
