#!/usr/bin/env python3
"""Drive the clock_max_block segmentation path on the real TPU: segmented
(segs>=2) vs unsegmented fused chain on a locked LRIT signal must produce
identical valid symbols, and the symbols must look like BPSK (|soft|~0.5).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from tests.test_demod_chain import make_lrit_signal
from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
from xritdemod_tpu.utils.cplx import CF32


def run(cfg, sig, C, T, blocks):
    dm = Demodulator(cfg, block_len=T)
    st = dm.init_state_batch(C)
    outs = []
    for b in range(blocks):
        x = np.tile(sig[b * T : (b + 1) * T], (C, 1))
        xc = CF32(jnp.asarray(x.real.astype(np.float32)),
                  jnp.asarray(x.imag.astype(np.float32)))
        soft, valid, st = dm.block_batch(xc, st)
        outs.append((np.asarray(soft), np.asarray(valid)))
    return dm, outs


def main():
    print("backend:", jax.default_backend())
    C, T, blocks = 128, 1 << 16, 2
    cfg_u = DemodConfig.lrit(sample_rate=1_250_000)
    cfg_s = DemodConfig.lrit(sample_rate=1_250_000, clock_max_block=1 << 15)
    rng = np.random.default_rng(7)
    sig, nsym = make_lrit_signal(rng, int(blocks * T / cfg_u.sps) - 8, cfg_u)
    dm_s, outs_s = run(cfg_s, sig, C, T, blocks)
    dm_u, outs_u = run(cfg_u, sig, C, T, blocks)
    assert dm_s._clock_segs == 2 and dm_u._clock_segs == 1, (
        dm_s._clock_segs, dm_u._clock_segs)
    nsyms = 0
    for (ss, vs), (su, vu) in zip(outs_s, outs_u):
        assert vs.sum() == vu.sum(), (vs.sum(), vu.sum())
        for c in range(C):
            a, b = ss[c][vs[c]], su[c][vu[c]]
            np.testing.assert_array_equal(a, b)
        nsyms += int(vs[0].sum())
    # quality: locked BPSK symbols in the steady-state second block
    s1, v1 = outs_u[1]
    tail = s1[0][v1[0]][1000:]
    mag = np.abs(tail)
    eye = mag.mean() / (np.abs(mag - mag.mean()).mean() + 1e-9)
    print(f"segs=2 vs segs=1 bit-identical over {nsyms} syms/ch x {C} ch")
    print(f"|soft| mean {mag.mean():.3f} eye {eye:.1f}")
    assert 0.3 < mag.mean() < 0.7, mag.mean()
    assert eye > 4, eye
    # expected symbol budget
    expect = blocks * T / cfg_u.sps
    assert abs(nsyms - expect) < expect * 0.01, (nsyms, expect)
    print("OK")


if __name__ == "__main__":
    main()
