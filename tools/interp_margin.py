#!/usr/bin/env python3
"""Demod-layer lock/decode margin per clock-interp mode.

BER_SWEEP enters at the soft-symbol layer; this sweeps noise at the RAW
IQ layer through the full fused receive (demod -> ring -> FEC, the soak
path) for BOTH interpolator families and counts recovered frames — the
demod-layer margin artifact showing the tabulated-MMSE ("mmse", the
GR-parity table and shipped default) and exact-mu windowed-sinc ("sinc")
taps share the same lock/decode threshold.

Per (interp, sigma): ONE clean coded LRIT capture, C=128 independent
AWGN realizations as channels (int8 wire, the cached soak program
shapes), frames counted per channel against TX truth.

Usage: interp_margin.py [--json OUT] [--sigmas 0.1,0.3,...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from xritdemod_tpu import tx
from xritdemod_tpu.models.decoder import DecoderConfig
from xritdemod_tpu.models.demodulator import DemodConfig
from xritdemod_tpu.models.receiver import FusedReceiver
from xritdemod_tpu.utils.cplx import quantize_iq_s8


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", default=None)
    p.add_argument("--sigmas", default="0.05,0.30,0.40,0.50,0.60,0.70")
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--blocks", type=int, default=4)
    args = p.parse_args()
    sigmas = [float(s) for s in args.sigmas.split(",")]
    C, T = args.channels, 1 << 17

    cfg_base = DemodConfig.lrit(sample_rate=1_250_000)
    total = args.blocks * T
    nframes = int(total / cfg_base.sps) // 16384 - 1
    rng = np.random.default_rng(23)
    vcdus = tx.make_vcdus(nframes, scid=13, vcid=5, rng=rng)
    symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
    clean = tx.modulate(symbols, cfg_base, rng, freq_offset=1e-4,
                        clock_ppm=30.0, noise=0.0)
    clean = np.concatenate(
        [clean, np.zeros(max(0, total - len(clean)), np.complex64)]
    )[:total]
    ps = float(np.mean(np.abs(clean[np.abs(clean) > 0]) ** 2))
    want = {(5, i): bytes(vcdus[i]) for i in range(nframes)}
    print(f"backend={jax.default_backend()} capture={total} samples, "
          f"{nframes} frames, Ps={ps:.3f}", flush=True)

    results = []
    for interp in ("mmse", "sinc"):
        cfg = DemodConfig.lrit(sample_rate=1_250_000, clock_interp=interp)
        rx = FusedReceiver(cfg, DecoderConfig(mode="lrit"), channels=C,
                           block_len=T)
        for sigma in sigmas:
            rng_n = np.random.default_rng(77)
            st = rx.init_state()
            per_ch: list[set] = [set() for _ in range(C)]
            t0 = time.perf_counter()
            for b in range(args.blocks + 2):
                if b < args.blocks:
                    blk = clean[b * T : (b + 1) * T]
                    x = np.tile(blk, (C, 1))
                    x = x + sigma * (
                        rng_n.standard_normal((C, T))
                        + 1j * rng_n.standard_normal((C, T))
                    ).astype(np.complex64)
                else:
                    x = np.zeros((C, T), np.complex64)   # flush
                batch, ok, ovf, st = rx.step_int8(
                    quantize_iq_s8(x).reshape(C, 2 * T), st
                )
                fok = np.asarray(batch.frame_ok) & np.asarray(ok)
                vcid = np.asarray(batch.vcid)
                ctr = np.asarray(batch.counter)
                vc = np.asarray(batch.vcdu)
                for c, j in zip(*np.nonzero(fok)):
                    key = (int(vcid[c, j]), int(ctr[c, j]))
                    if want.get(key) == bytes(vc[c, j]):
                        per_ch[c].add(key)
            counts = np.asarray([len(s) for s in per_ch])
            # cold-start head: a channel at full margin recovers all but
            # the pull-in frame(s)
            full = int(np.sum(counts >= nframes - 2))
            esn0 = 10.0 * np.log10(ps / (2.0 * sigma * sigma)) if sigma else None
            row = {
                "interp": interp,
                "sigma": sigma,
                "esn0_db": round(esn0, 2) if esn0 is not None else None,
                "channels_full": full,
                "channels": C,
                "frames_recovered": int(counts.sum()),
                "frames_possible": C * nframes,
                "frame_rate": round(float(counts.sum()) / (C * nframes), 4),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    out = {"capture_frames": nframes, "points": results}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    # The two families must share the margin: at every sigma the full-
    # lock channel counts agree within 10% of C.
    by_sigma = {}
    for r in results:
        by_sigma.setdefault(r["sigma"], {})[r["interp"]] = r["channels_full"]
    for s, d in by_sigma.items():
        assert abs(d["mmse"] - d["sinc"]) <= max(4, 0.1 * C), (s, d)
    print("MARGIN OK")


if __name__ == "__main__":
    main()
