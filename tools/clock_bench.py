"""Micro-benchmark for the M&M clock-recovery kernels (TPU).

Times, at the bench operating point (C channels x T samples, LRIT sps):
  - the exact per-symbol batch kernel (clock_recovery_block_batch)
  - the block-update kernel (clock_recovery_block_update_batch) at several
    (chunk, superchunks) geometries
  - the per-super-chunk serialized row gather in isolation (the suspected
    bottleneck: vmap'd per-channel dynamic_slice lowers to an XLA gather
    that serializes channel rows)

Usage: python tools/clock_bench.py [which ...]
  which in {exact, gather, k16x32, k32x32, k16x64, k64x16, ...} — any
  'k{chunk}x{superchunks}' spec works.  Default: gather exact k16x32 k32x32.
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from xritdemod_tpu.models.demodulator import DemodConfig
    from xritdemod_tpu.ops import clock_recovery as cr
    from xritdemod_tpu.utils.cplx import CF32

    C, T = 512, 1 << 17
    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    params = cr.ClockRecoveryParams(
        cfg.sps, cfg.clock_alpha**2 / 4, cfg.clock_alpha, cfg.clock_omega_limit
    )
    ns = cr.max_symbols(T, params)
    rng = np.random.default_rng(0)
    x = CF32(
        jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
    )
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (C,) + a.shape),
        cr.clock_recovery_init(params, cfg.clock_mu),
    )

    def sync(arr):
        # Index ONE element before np.asarray: converting the whole array
        # pulls it through the device tunnel (~20 s for a 60 MB output) and
        # poisons the timing (see .claude/skills/verify).
        return float(np.asarray(arr[(0,) * arr.ndim]))

    def timeit(name, fn, *args, iters=5, feedback=None):
        # `feedback(out, args) -> args` threads outputs back in (the carry
        # state): feeding the initial broadcast_to (stride-0) state every
        # call measures a pathological relayout path ~50x slower than the
        # production chain, which only ever uses it once.
        t0 = time.perf_counter()
        out = fn(*args)
        first = jax.tree.leaves(out)[0]
        sync(first)
        compile_s = time.perf_counter() - t0
        if feedback is not None:
            args = feedback(out, args)
            out = fn(*args)
            sync(jax.tree.leaves(out)[0])
        times = []
        for _ in range(iters):
            if feedback is not None:
                args = feedback(out, args)
            t0 = time.perf_counter()
            out = fn(*args)
            sync(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"{name}: best {best*1e3:.1f} ms  compile {compile_s:.1f}s  "
            f"({C*T/best/1e6:.0f} Msamp/s clock-only)  "
            f"times={[round(t*1e3,1) for t in times]}",
            flush=True,
        )
        return best

    which = sys.argv[1:] or ["gather", "exact", "k16x32", "k32x32"]

    for w in which:
        if w in ("gather_ta", "gather_taT"):
            # take_along_axis formulations of the same staging gather.
            om = params.omega
            cols = 512
            SW = 2304
            n_super = -(-ns // cols)
            pad = jnp.zeros((C, SW), jnp.float32)
            xr_p = jnp.concatenate([x.re, pad], axis=-1)
            xi_p = jnp.concatenate([x.im, pad], axis=-1)
            if w == "gather_ta":

                @jax.jit
                def g(xr_p, xi_p, base0):
                    iota = jnp.arange(SW, dtype=jnp.int32)

                    def step(base, _):
                        idx = base[:, None] + iota[None, :]
                        wr = jnp.take_along_axis(xr_p, idx, axis=1).T
                        wi = jnp.take_along_axis(xi_p, idx, axis=1).T
                        s = jnp.sum(wr) + jnp.sum(wi)
                        return base + jnp.int32(math.floor(cols * om)), s

                    _, ss = jax.lax.scan(step, base0, None, length=n_super)
                    return ss

            else:
                xr_pT = xr_p.T.copy()   # (Tn, C) channels-last
                xi_pT = xi_p.T.copy()

                @jax.jit
                def g(xr_pT, xi_pT, base0):
                    iota = jnp.arange(SW, dtype=jnp.int32)

                    def step(base, _):
                        idx = base[None, :] + iota[:, None]     # (SW, C)
                        wr = jnp.take_along_axis(xr_pT, idx, axis=0)
                        wi = jnp.take_along_axis(xi_pT, idx, axis=0)
                        s = jnp.sum(wr) + jnp.sum(wi)
                        return base + jnp.int32(math.floor(cols * om)), s

                    _, ss = jax.lax.scan(step, base0, None, length=n_super)
                    return ss

                xr_p, xi_p = xr_pT, xi_pT
            base0 = jnp.zeros((C,), jnp.int32)
            timeit(f"{w} x{n_super} (SW={SW})", g, xr_p, xi_p, base0)
        elif w == "gather":
            # The per-super-chunk staging gather in isolation, issued the
            # same number of times as the kernel would per block.
            om = params.omega
            cols = 512
            SW = 2304
            n_super = -(-ns // cols)
            pad = jnp.zeros((C, SW), jnp.float32)
            xr_p = jnp.concatenate([x.re, pad], axis=-1)
            xi_p = jnp.concatenate([x.im, pad], axis=-1)

            @jax.jit
            def gather_only(xr_p, xi_p, base0):
                def step(base, _):
                    wr = jax.vmap(
                        lambda row, b: jax.lax.dynamic_slice(row, (b,), (SW,))
                    )(xr_p, base).T
                    wi = jax.vmap(
                        lambda row, b: jax.lax.dynamic_slice(row, (b,), (SW,))
                    )(xi_p, base).T
                    s = jnp.sum(wr) + jnp.sum(wi)
                    base = base + jnp.int32(math.floor(cols * om))
                    return base, s

                _, ss = jax.lax.scan(step, base0, None, length=n_super)
                return ss

            base0 = jnp.zeros((C,), jnp.int32)
            timeit(f"gather x{n_super} (SW={SW})", gather_only, xr_p, xi_p, base0)
        elif w == "exact":
            fn = jax.jit(
                lambda x, st: cr.clock_recovery_block_batch(x, st, params, ns)
            )
            timeit(
                "exact chunk=16 super=32", fn, x, state,
                feedback=lambda out, a: (a[0], out[2]),
            )
        elif w == "pallas":
            from xritdemod_tpu.ops.clock_pallas import (
                clock_recovery_block_pallas_batch,
            )

            fn = lambda x, st: clock_recovery_block_pallas_batch(
                x, st, params, ns
            )
            timeit(
                "pallas exact 16x32", fn, x, state,
                feedback=lambda out, a: (a[0], out[2]),
            )
        elif w.startswith("p") and "x" in w:
            from xritdemod_tpu.ops.clock_pallas import (
                clock_recovery_block_pallas_batch,
            )

            spec = w[1:]
            ct = 128
            if "c" in spec:
                spec, cts = spec.split("c")
                ct = int(cts)
            ck, sc = (int(v) for v in spec.split("x"))
            fn = lambda x, st, ck=ck, sc=sc, ct=ct: (
                clock_recovery_block_pallas_batch(
                    x, st, params, ns, chunk=ck, superchunks=sc, ct=ct
                )
            )
            timeit(
                f"pallas {ck}x{sc} ct={ct}", fn, x, state,
                feedback=lambda out, a: (a[0], out[2]),
            )
        elif w.startswith("k"):
            ck, sc = w[1:].split("x")
            ck, sc = int(ck), int(sc)
            fn = jax.jit(
                lambda x, st, ck=ck, sc=sc: cr.clock_recovery_block_update_batch(
                    x, st, params, ns, chunk=ck, superchunks=sc
                )
            )
            timeit(
                f"block-update chunk={ck} super={sc}", fn, x, state,
                feedback=lambda out, a: (a[0], out[2]),
            )
        else:
            print(f"unknown spec {w}", file=sys.stderr)

    print(f"# backend={jax.default_backend()} C={C} T={T} slots={ns}")


if __name__ == "__main__":
    main()
