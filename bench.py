"""Benchmark: demod-chain throughput per chip (headline metric).

Measures Msamples/s/chip through the full BPSK demod chain (AGC -> RRC FIR
-> Costas -> M&M clock recovery) on a channel-batched block, the TPU-native
replacement for the reference's single-stream real-time pipeline.

vs_baseline is the multiple of the reference's implied real-time operating
point — it must sustain its configured input rate of 1.25 Msps for GOES
LRIT on a desktop CPU (BASELINE.md; /root/reference/demodulator/xritdemod.cfg:9).
Target from BASELINE.json: >= 100x real time per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xritdemod_tpu.models.demodulator import DemodConfig
    from xritdemod_tpu.parallel.channels import ChannelDemodulator
    from xritdemod_tpu.utils.cplx import CF32

    C = int(os.environ.get("BENCH_CHANNELS", "512"))
    T = int(os.environ.get("BENCH_BLOCK", str(1 << 17)))
    iters = int(os.environ.get("BENCH_ITERS", "6"))

    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    demod = ChannelDemodulator(cfg, channels=C, block_len=T)

    rng = np.random.default_rng(0)
    x = CF32(
        jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
    )
    state = demod.init_state()

    def sync(arr):
        # jax.block_until_ready is a NO-OP on the axon backend (see
        # .claude/skills/verify): the only reliable completion barrier is a
        # device->host transfer, so pull one element.
        return float(np.asarray(arr[0, 0]))

    # Warmup / compile.
    t0 = time.perf_counter()
    soft, valid, state = demod.process(x, state)
    sync(soft)
    print(f"# compile+first {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        soft, valid, state = demod.process(x, state)
        sync(soft)
        times.append(time.perf_counter() - t0)

    best = min(times)
    msps = C * T / best / 1e6
    baseline_msps = 1.25  # reference real-time LRIT input rate, 1 stream
    print(
        json.dumps(
            {
                "metric": "demod_chain_throughput_per_chip",
                "value": round(msps, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / baseline_msps, 1),
            }
        )
    )
    print(
        f"# channels={C} block={T} iters={iters} "
        f"times={[round(t, 3) for t in times]} backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
