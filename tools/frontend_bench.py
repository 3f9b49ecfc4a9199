"""TPU micro-bench: fused front-end kernel and channels-last clock, alone.

Also serves to warm the persistent compile cache piecewise before the full
chain bench (bench.py), whose cold compile otherwise spans several kernels.

Usage: python tools/frontend_bench.py [frontend|clock|both]
Env: BENCH_CHANNELS (512), BENCH_BLOCK (131072), BENCH_ITERS (6)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def _sync(arr):
    return float(np.asarray(arr).ravel()[0])


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    import jax
    import jax.numpy as jnp

    from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
    from xritdemod_tpu.utils.cplx import CF32

    C = int(os.environ.get("BENCH_CHANNELS", "512"))
    T = int(os.environ.get("BENCH_BLOCK", str(1 << 17)))
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    demod = Demodulator(cfg, block_len=T)

    rng = np.random.default_rng(0)
    xT = CF32(
        jnp.asarray(rng.normal(0, 0.3, (T, C)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.3, (T, C)).astype(np.float32)),
    )
    print(f"# backend={jax.default_backend()} C={C} T={T}", file=sys.stderr)

    if which in ("frontend", "both"):
        from xritdemod_tpu.ops import agc as agc_op
        from xritdemod_tpu.ops import costas as costas_op
        from xritdemod_tpu.ops.frontend_pallas import demod_frontend_pallas
        from xritdemod_tpu.ops import fir

        g0 = agc_op.agc_init(demod._agc, (C,))
        h0 = fir.fir_init(cfg.rrc_taps, (C,))
        cs0 = costas_op.costas_init((C,))
        t0 = time.perf_counter()
        y, g, h, cs = demod_frontend_pallas(
            xT, g0, h0, cs0, demod._agc, demod._rrc_taps_t, demod._costas
        )
        _sync(y.re[0, 0])
        print(f"# frontend compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            y, g, h, cs = demod_frontend_pallas(
                xT, g0, h0, cs0, demod._agc, demod._rrc_taps_t, demod._costas
            )
            _sync(y.re[0, 0])
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"frontend: {best*1e3:.1f} ms  "
              f"{C*T/best/1e6:.0f} Msamp/s  times={[round(t,3) for t in ts]}")

    if which in ("clock", "both"):
        from xritdemod_tpu.ops.clock_pallas import (
            clock_recovery_block_pallas_batch_cl,
        )

        st = demod.init_state_batch(C).clock
        t0 = time.perf_counter()
        s, v, st2 = clock_recovery_block_pallas_batch_cl(
            xT, st, demod._clock, demod.num_slots
        )
        _sync(s.re[0, 0])
        print(f"# clock_cl compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            s, v, st2 = clock_recovery_block_pallas_batch_cl(
                xT, st, demod._clock, demod.num_slots
            )
            _sync(s.re[0, 0])
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"clock_cl: {best*1e3:.1f} ms  "
              f"{C*T/best/1e6:.0f} Msamp/s  times={[round(t,3) for t in ts]}")




def split_stages():
    """Ground truth: time each split stage alone at the bench shape."""
    import jax
    import jax.numpy as jnp

    from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
    from xritdemod_tpu.ops import agc as agc_op
    from xritdemod_tpu.ops import costas as costas_op
    from xritdemod_tpu.ops import fir
    from xritdemod_tpu.ops.stream_pallas import (
        agc_block_pallas, costas_block_pallas,
    )
    from xritdemod_tpu.utils.cplx import CF32

    C = int(os.environ.get("BENCH_CHANNELS", "512"))
    T = int(os.environ.get("BENCH_BLOCK", str(1 << 17)))
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    demod = Demodulator(cfg, block_len=T)
    rng = np.random.default_rng(0)
    x = CF32(
        jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
    )
    g0 = agc_op.agc_init(demod._agc, (C,))
    h0 = fir.fir_init(cfg.rrc_taps, (C,))
    cs0 = costas_op.costas_init((C,))

    frc = jax.jit(lambda a, h: fir.fir_block(a, demod._rrc_taps, h,
                                             method="matmul"))

    def timeit(name, fn):
        out = fn()
        _sync(jax.tree.leaves(out)[0].ravel()[0])
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            _sync(jax.tree.leaves(out)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms  times={[round(t,3) for t in ts]}")

    timeit("agc      ", lambda: agc_block_pallas(x, g0, demod._agc))
    timeit("rrc_matml", lambda: frc(x, h0))
    timeit("costas   ", lambda: costas_block_pallas(x, cs0, demod._costas))
    tr = jax.jit(lambda a: CF32(jnp.swapaxes(a.re, 0, 1),
                                jnp.swapaxes(a.im, 0, 1)))
    timeit("transpose", lambda: tr(x))


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "split"):
    split_stages()
elif __name__ == "__main__":
    main()
