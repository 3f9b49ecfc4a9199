#!/usr/bin/env python3
"""Long-capture soak: a multi-minute LRIT capture with carrier AND symbol-
clock drift through the full TPU receive, asserting (near-)zero frame loss.

The reference's de-facto integration test is a multi-second recorded GQRX
capture through the whole app (xritdemod.cfg:11,15); this is the same idea
at soak length with controlled impairments: sinusoidal carrier drift (the
Costas loop must track it) and sinusoidal symbol-clock drift (M&M omega
must track it), plus AWGN.  Runs the capture fold-parallel
(FoldedCaptureReceiver — the bulk-reprocessing path, which exercises the
full fused Pallas chain at C=folds) and accounts for every TX frame.

Usage: long_soak_tpu.py [seconds] [--json OUT]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from xritdemod_tpu import tx
from xritdemod_tpu.models.demodulator import DemodConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("seconds", nargs="?", type=float, default=60.0)
    p.add_argument("--json", default=None)
    p.add_argument("--folds", type=int, default=128)
    p.add_argument("--clock-ppm", type=float, default=100.0)
    p.add_argument("--freq-drift", type=float, default=2e-5)
    p.add_argument(
        "--clock-interp", choices=("sinc", "mmse"), default="mmse",
        help="M&M fractional interpolator (DemodConfig.clock_interp)",
    )
    p.add_argument(
        "--mode", choices=("lrit", "hrit"), default="lrit",
        help="operating point: LRIT 1.25 Msps / HRIT 3 Msps (Parameters.h)",
    )
    p.add_argument(
        "--wire", choices=("s8", "f32"), default="s8",
        help="host->device sample format: s8 = interleaved int8 IQ (the "
        "reference's native 8-bit ingest class, demodulator.cpp:54-74; "
        "1/4 the link bytes, dequantized on device), f32 = CF32 pair",
    )
    args = p.parse_args()

    if args.mode == "hrit":
        cfg = DemodConfig.hrit(sample_rate=3_000_000,
                               clock_interp=args.clock_interp)
    else:
        cfg = DemodConfig.lrit(sample_rate=1_250_000,
                               clock_interp=args.clock_interp)
    nsym = int(args.seconds * cfg.symbol_rate)
    nframes = nsym // 16384 - 1
    print(f"backend={jax.default_backend()} capture={args.seconds:.0f}s "
          f"({int(args.seconds * cfg.sample_rate)} samples, {nframes} frames)",
          flush=True)

    t0 = time.perf_counter()
    rng = np.random.default_rng(11)
    vcdus = tx.make_vcdus(nframes, scid=13, vcid=5, rng=rng)
    symbols = tx.encode_stream(vcdus, lrit=args.mode == "lrit", amp=1.0,
                               rng=rng)
    sig = tx.modulate(
        symbols, cfg, rng,
        freq_offset=1e-4, clock_ppm=args.clock_ppm,
        freq_drift=args.freq_drift, noise=0.02,
    )
    nsamples = len(sig)
    if args.wire == "s8":
        from xritdemod_tpu.utils.cplx import quantize_iq_s8

        sig = quantize_iq_s8(sig)
    t_synth = time.perf_counter() - t0
    print(f"synth {t_synth:.0f}s, {nsamples} samples ({args.wire} wire)",
          flush=True)

    from xritdemod_tpu.parallel.timeblocks import FoldedCaptureReceiver

    rx = FoldedCaptureReceiver(
        cfg, folds=args.folds, block_len=1 << 17,
        max_clock_ppm=args.clock_ppm,
    )
    # JIT warmup before the timed capture (one zero block of the
    # production shapes), standard serving practice: the one-time compile
    # is not part of streaming capability.  Reported separately.
    t_warm = rx.warm_jit(args.wire)
    print(f"jit warmup {t_warm:.0f}s", flush=True)
    t0 = time.perf_counter()
    out = rx.process(sig)
    t_rx = time.perf_counter() - t0

    got = {(vcid, ctr) for (_, vcid, ctr, _) in out}
    want = {(5, i) for i in range(nframes)}
    missing = want - got
    bad_payload = 0
    for (_, vcid, ctr, v) in out:
        if (vcid, ctr) in want and v != bytes(vcdus[ctr]):
            bad_payload += 1
    xrt = nsamples / cfg.sample_rate / t_rx
    result = {
        "mode": args.mode,
        "seconds": args.seconds,
        "samples": nsamples,
        "wire": args.wire,
        "frames_sent": nframes,
        "frames_recovered": len(got & want),
        "frames_missing": len(missing),
        "payload_mismatches": bad_payload,
        "clock_ppm": args.clock_ppm,
        "freq_drift": args.freq_drift,
        "clock_interp": args.clock_interp,
        "rx_wall_s": round(t_rx, 1),
        "jit_warmup_s": round(t_warm, 1),
        # rx_wall excludes the pre-warmed one-time compile; this is
        # streaming capability incl. ALL per-sample host work (fold
        # assembly, H2D, device, stacked D2H).
        "x_realtime_incl_host": round(xrt, 1),
        "timings": getattr(rx, "last_timings", {}),
        "backend": jax.default_backend(),
        "folds": args.folds,
    }
    print(json.dumps(result), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
    assert bad_payload == 0, "payload corruption"
    assert len(missing) <= 2, f"{len(missing)} frames lost: {sorted(missing)[:10]}"
    print("SOAK OK")


if __name__ == "__main__":
    main()
