#!/usr/bin/env python3
"""Drive the fused on-device receiver (IQ -> VCDUs, no host symbol hop) on
the real TPU: correctness (bit-exact VCDUs vs the TX fixture) + pipelined
throughput.

Usage: drive_fused_rx_tpu.py [channels] [block_log2] [blocks]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from xritdemod_tpu import tx
from xritdemod_tpu.tx import modulate as _modulate
from xritdemod_tpu.models.decoder import DecoderConfig
from xritdemod_tpu.models.demodulator import DemodConfig
from xritdemod_tpu.models.receiver import FusedReceiver


def main():
    Cn = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 17)
    nblocks = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    print("backend:", jax.default_backend())

    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    dcfg = DecoderConfig(mode="lrit")
    rng = np.random.default_rng(3)
    nframes = int(nblocks * T / cfg.sps / 16384) + 2
    vcdus = tx.make_vcdus(nframes, scid=13, vcid=5, rng=rng)
    symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
    sig = _modulate(symbols, cfg, rng)
    want = {(int(v[1]) & 0x3F, bytes(v)) for v in np.asarray(vcdus)}

    rx = FusedReceiver(cfg, dcfg, channels=Cn, block_len=T)
    st = rx.init_state()
    print(f"C={Cn} T={T} k={rx.k} ring={rx.ring_len}")

    # Correctness pass: drive the real capture through, all channels the
    # same stream, check channel 0's frames bit-exact.
    got = []
    t0 = time.perf_counter()
    blocks = []
    for b in range(nblocks):
        x = sig[b * T : (b + 1) * T]
        if len(x) < T:
            break
        blocks.append(np.tile(x, (Cn, 1)))
    for xb in blocks:
        batch, ok, ovf, st = rx.step(xb, st)
        okh = np.asarray(ok[0])
        fok = np.asarray(batch.frame_ok[0])
        vc = np.asarray(batch.vcdu[0])
        for j in range(rx.k):
            if okh[j] and fok[j]:
                got.append(bytes(vc[j]))
        assert not np.asarray(ovf).any()
    print(f"# correctness pass {time.perf_counter()-t0:.1f}s")
    got_set = {(v[1] & 0x3F, v) for v in got}
    missing = want - got_set
    extra = got_set - want
    print(f"frames: got {len(got)}, want {len(want)}, "
          f"missing {len(missing)}, extra {len(extra)}")
    assert len(got) >= len(want) - 3, (len(got), len(want))
    assert not extra, "non-TX frames decoded"

    # Throughput pass: pipelined (queue all, sync once).  Blocks must be
    # device-resident CF32 up front — a numpy block means a ~C*T*8-byte
    # host->device transfer through the tunnel EVERY step, which swamps
    # the compute by ~50x (see .claude/skills/verify).
    from xritdemod_tpu.utils.cplx import CF32

    dev_blocks = [
        CF32(jnp.asarray(b.real.astype(np.float32)),
             jnp.asarray(b.imag.astype(np.float32)))
        for b in blocks
    ]
    st = rx.init_state()
    batch, ok, ovf, st = rx.step(dev_blocks[0], st)
    float(np.asarray(batch.vit_errors[0, 0]))   # sync (block_until_ready no-op)
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        batch, ok, ovf, st = rx.step(dev_blocks[i % len(dev_blocks)], st)
    float(np.asarray(batch.vit_errors[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    msps = Cn * T / dt / 1e6
    fps = float(np.asarray(ok).sum()) / dt  # ok count of last batch ~ frames/step
    print(f"pipelined {dt*1000:.1f} ms/block  {msps:.0f} Msamp/s  "
          f"~{fps:.0f} frames/s")


if __name__ == "__main__":
    main()
