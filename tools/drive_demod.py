"""Drive the batched demod chain on TPU with a real RRC-shaped LRIT signal.

Verify-skill drive: synthesizes carrier-offset BPSK (same fixture as
tests/test_demod_chain.py::make_lrit_signal), runs the batch chain (Pallas
clock kernel auto-selected on TPU at C%128==0), and checks symbol count,
eye ratio, and soft-symbol magnitude.

Usage: python tools/drive_demod.py [C] [nblocks]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_demod_chain import make_lrit_signal

    from xritdemod_tpu.models.demodulator import DemodConfig
    from xritdemod_tpu.parallel.channels import ChannelDemodulator
    from xritdemod_tpu.utils.cplx import CF32

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    NB = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    T = 1 << 17
    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    demod = ChannelDemodulator(cfg, channels=C, block_len=T)

    # make_lrit_signal's np.convolve is O(N*taps); swap in fftconvolve for
    # drive-scale captures (same-length 'same' mode, numerically equivalent).
    import scipy.signal

    np.convolve_orig = np.convolve
    np.convolve = lambda a, b, mode="full": scipy.signal.fftconvolve(a, b, mode=mode)
    rng = np.random.default_rng(3)
    nsym = int(NB * T / cfg.sps) + 400
    sig, _bits = make_lrit_signal(rng, nsym, cfg)
    np.convolve = np.convolve_orig
    sig = sig[: NB * T]
    assert len(sig) == NB * T, f"signal too short: {len(sig)}"
    state = demod.init_state()
    softs, valids = [], []
    import jax

    # Ship ONE channel per block (1 MB through the tunnel) and broadcast
    # on-device — the tunnel moves ~MB/s, a (512, T) host array would take
    # minutes per block.
    tile = jax.jit(
        lambda r, i: CF32(
            jnp.tile(r[None, :], (C, 1)), jnp.tile(i[None, :], (C, 1))
        )
    )
    for b in range(NB):
        blk = sig[b * T : (b + 1) * T]
        x = tile(jnp.asarray(blk.real.copy()), jnp.asarray(blk.imag.copy()))
        soft, valid, state = demod.process(x, state)
        # Pull back only 3 probe channels (full (C, slots) is huge).
        probe = (0, C // 2, C - 1)
        softs.append(np.stack([np.asarray(soft[c]) for c in probe]))
        valids.append(np.stack([np.asarray(valid[c]) for c in probe]))
    soft = np.concatenate(softs, axis=1)
    valid = np.concatenate(valids, axis=1)

    import jax

    print("backend:", jax.default_backend())
    sps = cfg.sps
    for pc, c in enumerate((0, C // 2, C - 1)):
        s = soft[pc][valid[pc]]
        tail = s[len(s) // 2 :]                      # post-convergence half
        eye = np.abs(tail).mean() / (np.abs(np.abs(tail) - np.abs(tail).mean()).mean() + 1e-9)
        nexp = NB * T / sps
        print(
            f"ch{c}: syms={len(s)} (expect ~{nexp:.0f}) "
            f"eye={eye:.2f} |soft|={np.abs(tail).mean():.3f}"
        )
        assert abs(len(s) - nexp) < 0.01 * nexp, "symbol count off"
        assert eye > 4.0, f"eye ratio too low: {eye}"
        assert 0.3 < np.abs(tail).mean() < 0.7, "soft magnitude off"
    print("DRIVE OK")


if __name__ == "__main__":
    main()
