#!/usr/bin/env python3
"""Break down the end-to-end (incl. host) soak budget on the real chip.

Round-3 VERDICT item 2: LONGRUN x_realtime_incl_host was 0.7 while the
device alone does ~1900x real time — where does the wall time go?  This
measures each candidate in isolation:

  1. TX synthesis rate (numpy, host)
  2. fold-block assembly rate (numpy memcpy, host)
  3. H2D rate: f32 pair planes vs int8 interleaved, large blocks
  4. D2H rate: large array pull vs ONE-element sync vs many small pulls
     (per-transfer latency floor x fields x blocks is the suspected killer)
  5. device compute, pipelined (known ~2400 Msamp/s)

Usage: host_budget_profile.py [--blocks N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def t(fn, n=3):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--blocks", type=int, default=4)
    args = p.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    F, T = 128, 1 << 17
    rng = np.random.default_rng(0)

    # 1. TX synth rate
    from xritdemod_tpu import tx
    from xritdemod_tpu.models.demodulator import DemodConfig

    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    nframes = 4
    t0 = time.perf_counter()
    vcdus = tx.make_vcdus(nframes, rng=rng)
    symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
    sig = tx.modulate(symbols, cfg, rng, freq_offset=1e-4, noise=0.02)
    dt = time.perf_counter() - t0
    print(f"1. tx synth: {len(sig)/dt/1e6:.1f} Msamp/s "
          f"({len(sig)} samples in {dt:.2f}s)", flush=True)

    # 2. fold assembly (memcpy into (F, T) complex64)
    cap = (rng.normal(0, 0.3, F * T // 8) + 0j).astype(np.complex64)
    buf = np.zeros((F, T), np.complex64)

    def fold():
        for f in range(F):
            s0 = (f * 997) % (len(cap) - T)
            buf[f] = cap[s0 : s0 + T]

    dt = t(fold)
    print(f"2. fold assembly: {F*T/dt/1e6:.0f} Msamp/s "
          f"({dt*1e3:.0f} ms per (128, 131072) block)", flush=True)

    # 3. H2D rates
    xr = buf.real.astype(np.float32).copy()
    xi = buf.imag.astype(np.float32).copy()
    q = (np.clip(buf.view(np.float32) * 127, -127, 127)
         .astype(np.int8).reshape(F, 2 * T))

    def h2d_f32():
        a = jnp.asarray(xr)
        b = jnp.asarray(xi)
        _ = float(jnp.sum(a[0, :1] + b[0, :1]))

    def h2d_i8():
        a = jnp.asarray(q)
        _ = int(jnp.sum(a[0, :1]))

    dt = t(h2d_f32)
    print(f"3a. H2D f32 pair: {2*xr.nbytes/dt/1e6:.0f} MB/s "
          f"-> {F*T/dt/1e6:.0f} Msamp/s", flush=True)
    dt = t(h2d_i8)
    print(f"3b. H2D int8 interleaved: {q.nbytes/dt/1e6:.0f} MB/s "
          f"-> {F*T/dt/1e6:.0f} Msamp/s", flush=True)

    # 4. D2H
    big = jnp.ones((F, 1, 892), jnp.uint8) * 7      # one block's vcdu field
    _ = int(np.asarray(big[0, 0, 0]))

    def d2h_block():
        _ = np.asarray(big)

    dt = t(d2h_block)
    print(f"4a. D2H one (128,1,892) u8 field: {dt*1e3:.1f} ms "
          f"({big.size/dt/1e6:.1f} MB/s)", flush=True)

    one = jnp.ones((1,), jnp.float32)

    def d2h_one():
        _ = float(np.asarray(one[0]))

    dt = t(d2h_one, n=10)
    print(f"4b. D2H 4-byte sync: {dt*1e3:.1f} ms latency floor", flush=True)

    big2 = jnp.ones((600, F, 892), jnp.uint8)
    _ = int(np.asarray(big2[0, 0, 0]))
    t0 = time.perf_counter()
    _ = np.asarray(big2)
    dt = time.perf_counter() - t0
    print(f"4c. D2H bulk {big2.nbytes/1e6:.0f} MB: {dt:.1f}s "
          f"({big2.nbytes/dt/1e6:.1f} MB/s)", flush=True)

    # 5. device compute pipelined (demod only, known number)
    from xritdemod_tpu.models.demodulator import Demodulator
    from xritdemod_tpu.utils.cplx import CF32

    dm = Demodulator(cfg, block_len=T)
    st = dm.init_state_batch(F)
    xc = CF32(jnp.asarray(xr), jnp.asarray(xi))
    soft, valid, st = dm.block_batch(xc, st)   # compile
    _ = float(np.asarray(soft[0, 0]))
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        soft, valid, st = dm.block_batch(xc, st)
    _ = float(np.asarray(soft[0, 0]))
    dt = (time.perf_counter() - t0) / n
    print(f"5. device demod pipelined: {F*T/dt/1e6:.0f} Msamp/s", flush=True)


if __name__ == "__main__":
    main()
