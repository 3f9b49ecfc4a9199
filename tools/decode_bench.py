"""Per-stage timing of the CADU decode chain on TPU.

Times Viterbi, RS, correlator, and the glue separately (each its own jit)
to locate the decode bottleneck.  Usage: python tools/decode_bench.py [B]
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

    from xritdemod_tpu import constants as C
    from xritdemod_tpu import tx
    from xritdemod_tpu.models.decoder import CaduDecoder, DecoderConfig
    from xritdemod_tpu.ops import correlator as corr_op
    from xritdemod_tpu.ops import reed_solomon as rs_op
    from xritdemod_tpu.ops import viterbi as vit_op

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    vcdus = tx.make_vcdus(B, rng=np.random.default_rng(1))
    soft = tx.encode_stream(vcdus, lrit=True, noise=0.1)
    soft_dev = jnp.asarray(soft)

    dec = CaduDecoder(DecoderConfig(mode="lrit", frames_per_block=B))
    tail = dec.init_tail()

    def sync(arr):
        return float(np.asarray(arr[(0,) * arr.ndim]))

    def timeit(name, fn, *args, iters=5):
        out = fn(*args)
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "ndim")]
        sync(leaves[0])
        compile_t = time.perf_counter() - t0
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(leaves[0])
            times.append((time.perf_counter() - t0) * 1e3)
        print(
            f"{name:24s} best {min(times):8.1f} ms  "
            f"times={[round(t, 1) for t in times]}",
            flush=True,
        )
        return out

    # Full chain
    timeit("full decode_block", lambda s, t: dec.decode_block(s, t), soft_dev, tail)

    # Viterbi alone on realistic input
    ext = jnp.asarray(
        np.random.default_rng(0).normal(0, 64, (B, 2 * (C.FRAME_BITS + 32))).astype(np.float32)
    )
    vit = jax.jit(vit_op.viterbi_decode)
    timeit(f"viterbi B={B}", vit, ext)

    # RS alone: (B, 1020) derandomized frame bytes
    fb = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (B, 1020), dtype=np.int32)
    )
    rsd = jax.jit(lambda c: rs_op.rs_decode_frame(c))
    timeit(f"rs frame B={B}", rsd, fb)

    # Correlator at expected starts
    templates = dec._templates
    starts = jnp.arange(B, dtype=jnp.int32) * C.CODED_FRAME_SIZE
    corr = jax.jit(lambda s: corr_op.correlate_at(s, templates, starts))
    timeit("correlate_at", corr, soft_dev)

    print(f"# backend={jax.default_backend()} B={B}")


if __name__ == "__main__":
    main()
