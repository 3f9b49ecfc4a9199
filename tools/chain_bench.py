"""Per-stage timing of the demod chain on TPU (C x T bench operating point).

Times each stage as its own jitted step with state feedback threaded
between calls (see tools/clock_bench.py for why feedback matters), so the
sum approximates the fused chain and the max identifies the bottleneck.

Usage: python tools/chain_bench.py [C] [T]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
    from xritdemod_tpu.ops import agc as agc_op
    from xritdemod_tpu.ops import clock_recovery as cr
    from xritdemod_tpu.ops import costas as costas_op
    from xritdemod_tpu.ops import fir
    from xritdemod_tpu.utils.cplx import CF32

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 17
    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    demod = Demodulator(cfg, block_len=T)

    rng = np.random.default_rng(0)
    x = CF32(
        jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
    )
    state = demod.init_state_batch(C)

    def sync(out):
        # Index ONE element before np.asarray: converting a whole array
        # pulls it through the device tunnel and poisons the timing.
        arr = jax.tree.leaves(out)[0]
        return float(np.asarray(arr[(0,) * arr.ndim]))

    def timeit(name, fn, *args, iters=5, feedback=None):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        compile_s = time.perf_counter() - t0
        if feedback is not None:
            args = feedback(out, args)
            out = fn(*args)
            sync(out)
        times = []
        for _ in range(iters):
            if feedback is not None:
                args = feedback(out, args)
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"{name:24s} best {best*1e3:7.1f} ms  compile {compile_s:6.1f}s  "
            f"times={[round(t*1e3,1) for t in times]}",
            flush=True,
        )
        return out, best

    fb = lambda out, a: (a[0], out[1])

    agc_fn = jax.jit(
        lambda x, g: agc_op.agc_block(x, g, demod._agc)
    )
    (xa, _), t_agc = timeit("agc", agc_fn, x, state.agc_gain,
                            feedback=lambda o, a: (a[0], o[1]))

    fir_fn = jax.jit(lambda x, h: fir.fir_block(x, demod._rrc_taps, h))
    (xf, _), t_fir = timeit("rrc_fir", fir_fn, xa, state.rrc_hist,
                            feedback=lambda o, a: (a[0], o[1]))

    cos_fn = jax.jit(
        lambda x, st: costas_op.costas_block(x, st, demod._costas)
    )
    (xc, _), t_cos = timeit("costas", cos_fn, xf, state.costas,
                            feedback=lambda o, a: (a[0], o[1]))

    clk_fn = jax.jit(
        lambda x, st: cr.clock_recovery_block_batch(
            x, st, demod._clock, demod.num_slots
        )
    )
    _, t_clk = timeit("clock (exact barrel)", clk_fn, xc, state.clock,
                      feedback=lambda o, a: (a[0], o[2]))

    total = t_agc + t_fir + t_cos + t_clk
    print(
        f"{'sum':24s} {total*1e3:12.1f} ms  "
        f"({C*T/total/1e6:.0f} Msamp/s)  backend={jax.default_backend()}"
    )


if __name__ == "__main__":
    main()
