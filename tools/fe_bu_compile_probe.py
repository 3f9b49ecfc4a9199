"""Probe: compile+run the blocked fused front-end kernel alone on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu.ops import agc as agc_op
from xritdemod_tpu.ops import costas as costas_op
from xritdemod_tpu.ops import filters, fir
from xritdemod_tpu.ops.frontend_pallas import demod_frontend_pallas
from xritdemod_tpu.utils.cplx import CF32

BK = int(sys.argv[1]) if len(sys.argv) > 1 else 8
STAGES = sys.argv[2] if len(sys.argv) > 2 else "both"
T, C = 4096, 128
print(f"backend={jax.default_backend()} block_k={BK} stages={STAGES}", flush=True)
rng = np.random.default_rng(0)
x = CF32(
    jnp.asarray(rng.normal(0, 0.3, (T, C)).astype(np.float32)),
    jnp.asarray(rng.normal(0, 0.3, (T, C)).astype(np.float32)),
)
taps = tuple(float(v) for v in filters.rrc_taps(1.0, 1_250_000, 293_883, 0.5, 63))
agc_p = agc_op.AgcParams()
cp = costas_op.costas_gains(0.0037)
g0 = agc_op.agc_init(agc_p, (C,))
h0 = fir.fir_init(len(taps), (C,))
cs0 = costas_op.costas_init((C,))
t0 = time.perf_counter()
y, g, h, cs = demod_frontend_pallas(x, g0, h0, cs0, agc_p, taps, cp, block_k=BK, block_stages=STAGES)
print(f"first out {float(np.asarray(y.re[0, 0])):.4f} "
      f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)
