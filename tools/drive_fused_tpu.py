"""Verify drive: fused front-end batch path on the real TPU, lock check.

Synthesizes RRC-shaped BPSK with carrier offset (tests fixture), runs the
channel-batched demod with the fused Pallas front-end + channels-last clock
over several blocks, and checks symbol count / eye ratio / amplitude.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tests.test_demod_chain import make_lrit_signal
from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
from xritdemod_tpu.utils.cplx import CF32

assert jax.default_backend() == "tpu", jax.default_backend()

rng = np.random.default_rng(7)
C, T = 128, 1 << 16
cfg = DemodConfig.lrit(sample_rate=1_250_000)
sig, _ = make_lrit_signal(rng, 60_000, cfg)
demod = Demodulator(cfg, block_len=T)
state = demod.init_state_batch(C)
step = jax.jit(demod.block_batch)

outs = []
nblk = len(sig) // T
for b in range(nblk):
    x = np.tile(sig[b * T : (b + 1) * T], (C, 1))
    xc = CF32(jnp.asarray(x.real.astype(np.float32)),
              jnp.asarray(x.imag.astype(np.float32)))
    soft, valid, state = step(xc, state)
    outs.append((np.asarray(soft[0]), np.asarray(valid[0])))

soft = np.concatenate([s[v] for s, v in outs])
consumed = nblk * T
print(f"symbols={len(soft)} expected~{consumed / cfg.sps:.0f}")
assert abs(len(soft) - consumed / cfg.sps) < 50
tail = soft[len(soft) // 2 :]
eye = np.abs(tail).mean() / np.abs(tail).std()
print(f"eye={eye:.2f} mean|s|={np.abs(tail).mean():.3f}")
assert eye > 4.0, eye
assert 0.3 < np.abs(tail).mean() < 0.7
print("FUSED TPU DRIVE OK")
