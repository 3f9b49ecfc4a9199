"""End-to-end demod chain: locks on synthetic RRC-shaped BPSK with carrier
offset, matching the operating point of BASELINE.json config 1 (LRIT)."""

import jax.numpy as jnp
import numpy as np

from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator, quantize_symbols
from xritdemod_tpu.ops import filters


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
