"""Pipelined per-stage timing of the batch demod chain on TPU.

Each standalone dispatch through the axon tunnel costs ~30 ms fixed, so
per-op timing lies.  This tool times each stage the way bench.py times the
chain: N iterations queued back-to-back through carried state, ONE
device->host sync, divided by N.

Usage: python tools/stage_profile.py [C] [T] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
from xritdemod_tpu.utils.cplx import CF32

C = int(sys.argv[1]) if len(sys.argv) > 1 else 512
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 17
N = int(sys.argv[3]) if len(sys.argv) > 3 else 8

cfg = DemodConfig.lrit(
    sample_rate=1_250_000,
    clock_interp=os.environ.get("BENCH_CLOCK_INTERP", "sinc"),
)
dm = Demodulator(cfg, block_len=T)
rng = np.random.default_rng(0)
x = CF32(
    jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
    jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
)
state = dm.init_state_batch(C)

sync = lambda a: float(np.asarray(a).ravel()[0])
print(f"backend={jax.default_backend()} C={C} T={T} iters={N}", flush=True)


def timed(name, fn, *args):
    out = fn(*args)          # compile
    sync(jax.tree.leaves(out)[0][(0,) * jax.tree.leaves(out)[0].ndim])
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0][(0,) * jax.tree.leaves(out)[0].ndim])
    dt = (time.perf_counter() - t0) / N
    print(f"{name:34s} {dt * 1e3:8.2f} ms/block", flush=True)
    return out


# Stage 1+2+3: fused front-end (transpose + AGC+RRC+Costas kernel)
from xritdemod_tpu.ops.frontend_pallas import demod_frontend_pallas


# The demodulator's own auto-tune resolution (bf16 matmuls, K=8 slab,
# row tile narrowing with C) — shared so the profiler always times the
# production configuration.
_, _, _fe_bu, _fe_prec, _fe_rows = dm._resolve_fused(C, T)


@jax.jit
def frontend(x, st):
    xT = CF32(jnp.swapaxes(x.re, 0, 1), jnp.swapaxes(x.im, 0, 1))
    return demod_frontend_pallas(
        xT, st.agc_gain, st.rrc_hist, st.costas,
        dm._agc, dm._rrc_taps_t, dm._costas,
        block_k=_fe_bu, precision=_fe_prec, rows=_fe_rows,
    )


yT, g, h, cs = timed("frontend (transpose+fused kernel)", frontend, x, state)

# Clock from channels-last input
from xritdemod_tpu.ops.clock_pallas import clock_recovery_block_pallas_batch_cl


_ck_kw = dm._clock_pallas_kw(False, C)


@jax.jit
def clock_cl(yT, st):
    return clock_recovery_block_pallas_batch_cl(
        yT, st.clock, dm._clock, dm.num_slots, **_ck_kw
    )


timed("clock (channels-last pallas)", clock_cl, yT, state)

# Whole chain for reference
timed("full chain (block_batch)", jax.jit(dm.block_batch), x, state)
