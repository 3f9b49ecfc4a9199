"""Generate the frozen raw-IQ fixture for the demod-DSP known-answer tests.

The fixture (tests/fixtures/demod_kat_iq.bin) is a short LRIT-rate BPSK
capture synthesized INDEPENDENTLY of xritdemod_tpu/tx.py: the pulse train
is evaluated densely from the closed-form (textbook) root-raised-cosine
impulse response at exact fractional symbol positions — not by convolving
an upsampled impulse train with discrete firdes taps (tx.py's method) —
so no tap-design or filtering code is shared with the package under test.

The file is float32 interleaved I/Q; its SHA-256 is pinned in
tests/test_demod_kat.py.  Run once; the output is committed.

Reference operating point: /root/reference/demodulator/xritdemod.cfg:9-15
(1.25 Msps LRIT capture playback), Parameters.h:20-24.
"""

from __future__ import annotations

import hashlib
import pathlib

import numpy as np

# Operating point (LRIT, matches the reference capture playback config).
FS = 1_250_000.0          # samples/s
SYMBOL_RATE = 293_883.0   # symbols/s
ALPHA = 0.5               # RRC roll-off
N_SAMPLES = 65_536
CLOCK_PPM = 30.0          # symbol-clock offset
CARRIER_HZ = 500.0        # carrier frequency offset
CARRIER_PHASE0 = 0.7      # rad
AMPLITUDE = 0.3           # pre-AGC signal scale
NOISE_SIGMA = 0.02        # per-component AWGN
SEED = 20250821
PULSE_SPAN_SYM = 8        # one-sided pulse truncation, in symbols

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def rrc_pulse(t: np.ndarray, alpha: float) -> np.ndarray:
    """Closed-form root-raised-cosine impulse response, t in symbol units.

    h(t) = [sin(pi t (1-a)) + 4 a t cos(pi t (1+a))] / [pi t (1 - (4 a t)^2)]
    with the standard limits at t = 0 and |t| = 1/(4a).
    """
    t = np.asarray(t, np.float64)
    h = np.zeros_like(t)
    t0 = np.abs(t) < 1e-12
    ts = np.abs(np.abs(t) - 1.0 / (4.0 * alpha)) < 1e-9
    reg = ~(t0 | ts)
    tr = t[reg]
    h[reg] = (
        np.sin(np.pi * tr * (1.0 - alpha))
        + 4.0 * alpha * tr * np.cos(np.pi * tr * (1.0 + alpha))
    ) / (np.pi * tr * (1.0 - (4.0 * alpha * tr) ** 2))
    h[t0] = 1.0 - alpha + 4.0 * alpha / np.pi
    h[ts] = (alpha / np.sqrt(2.0)) * (
        (1.0 + 2.0 / np.pi) * np.sin(np.pi / (4.0 * alpha))
        + (1.0 - 2.0 / np.pi) * np.cos(np.pi / (4.0 * alpha))
    )
    return h


def main() -> None:
    rng = np.random.default_rng(SEED)
    sps = FS / (SYMBOL_RATE * (1.0 + CLOCK_PPM * 1e-6))
    n_sym = int(N_SAMPLES / sps) + 2 * PULSE_SPAN_SYM + 4
    bits = rng.integers(0, 2, size=n_sym)
    amps = 1.0 - 2.0 * bits.astype(np.float64)      # bit 0 -> +1, 1 -> -1

    # Dense pulse-train evaluation at exact fractional symbol centers.
    sig = np.zeros(N_SAMPLES, np.float64)
    win = int(np.ceil(PULSE_SPAN_SYM * sps)) + 1
    offs = np.arange(-win, win + 1, dtype=np.float64)         # (W,)
    for m in range(n_sym):
        center = (m - PULSE_SPAN_SYM) * sps
        base = int(np.round(center))
        n_idx = base + offs.astype(np.int64)
        t_sym = (n_idx.astype(np.float64) - center) / sps     # symbol units
        ok = (n_idx >= 0) & (n_idx < N_SAMPLES)
        np.add.at(sig, n_idx[ok], amps[m] * rrc_pulse(t_sym[ok], ALPHA))

    n = np.arange(N_SAMPLES, dtype=np.float64)
    carrier = np.exp(1j * (2.0 * np.pi * CARRIER_HZ / FS * n + CARRIER_PHASE0))
    x = AMPLITUDE * sig * carrier
    x = x + NOISE_SIGMA * (
        rng.standard_normal(N_SAMPLES) + 1j * rng.standard_normal(N_SAMPLES)
    )

    iq = np.empty(2 * N_SAMPLES, np.float32)
    iq[0::2] = x.real.astype(np.float32)
    iq[1::2] = x.imag.astype(np.float32)

    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / "demod_kat_iq.bin"
    path.write_bytes(iq.tobytes())
    digest = hashlib.sha256(iq.tobytes()).hexdigest()
    print(f"wrote {path} ({iq.nbytes} bytes)")
    print(f"sha256 = {digest}")


if __name__ == "__main__":
    main()
