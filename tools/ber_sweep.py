#!/usr/bin/env python3
"""Decoded-frame BER / frame-success sweep vs SNR (headline correctness metric).

Builds real CADU coded streams (xritdemod_tpu.tx), impairs them with AWGN at
swept Es/N0, runs the full CADU decode chain, and reports per-SNR:
frame success rate, post-FEC BER (vs the known VCDUs), Viterbi corrected
bits, and RS corrections.  The reference offers no such harness (it has no
tests at all, SURVEY.md §4) — its implied spec is "decodes real GOES
downlinks"; this quantifies the margin.

Usage: python tools/ber_sweep.py [--mode lrit|hrit] [--frames N] [--json]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax

    jax.config.update("jax_platforms", "cpu")
import argparse
import json
import sys

import numpy as np


def run_sweep(mode: str, nframes: int, snrs_db, seed: int = 0,
              frames_per_block: int = 4, segments: int = -1):
    """`frames_per_block`/`segments` pick the Viterbi kernel variant the
    sweep exercises: B*S/8 <= 128 lanes runs the register-carry forward
    kernel, wider runs the VMEM ping-pong butterfly
    (ops/viterbi_pallas._decode_bits)."""
    from xritdemod_tpu import tx
    from xritdemod_tpu.models.decoder import DecoderConfig, StreamDecoder

    rng = np.random.default_rng(seed)
    results = []
    for snr_db in snrs_db:
        # BPSK symbols at unit amplitude; AWGN sigma from Es/N0.
        sigma = float(10 ** (-snr_db / 20) / np.sqrt(2))
        vcdus = tx.make_vcdus(nframes, scid=13, vcid=5, rng=rng)
        soft = tx.encode_stream(
            vcdus, lrit=(mode == "lrit"), amp=1.0, noise=sigma, rng=rng
        )
        wire = tx.soft_to_int8(soft * 0.5)  # half-scale like AGC ref 0.5
        dec = StreamDecoder(DecoderConfig(
            mode=mode, frames_per_block=frames_per_block,
            viterbi_segments=segments,
        ))
        batches = dec.push(wire.astype(np.float32)) + dec.flush()

        ok = (
            np.concatenate([np.asarray(b.frame_ok) for b in batches])
            if batches
            else np.zeros(0, bool)
        )
        got = (
            np.concatenate([np.asarray(b.vcdu) for b in batches])
            if batches
            else np.zeros((0, 892), np.uint8)
        )
        vit = (
            np.concatenate([np.asarray(b.vit_errors) for b in batches])
            if batches
            else np.zeros(0)
        )
        # post-FEC BER over frames that claim success
        nbits = errs = 0
        for k in range(len(got)):
            if k < len(vcdus) and ok[k]:
                diff = np.unpackbits(got[k] ^ vcdus[k])
                errs += int(diff.sum())
                nbits += 892 * 8
        results.append(
            {
                "snr_db": float(snr_db),
                "frames_sent": nframes,
                "frames_ok": int(ok.sum()),
                "frame_success": float(ok.sum() / max(len(ok), 1)),
                "post_fec_ber": (errs / nbits) if nbits else None,
                "avg_vit_corrections": float(vit.mean()) if len(vit) else None,
            }
        )
    return results


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="lrit", choices=["lrit", "hrit"])
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--snrs", default="0,1,2,3,4,6,8")
    p.add_argument("--json", action="store_true")
    p.add_argument("--fpb", type=int, default=4,
                   help="decode batch width (frames per block)")
    p.add_argument("--segments", type=int, default=-1,
                   help="viterbi_segments (-1 auto; pick so fpb*segments/8 "
                   "lands on the register-carry (<=128 lanes) or "
                   "ping-pong (>128) forward kernel)")
    args = p.parse_args()
    snrs = [float(s) for s in args.snrs.split(",")]
    res = run_sweep(args.mode, args.frames, snrs,
                    frames_per_block=args.fpb, segments=args.segments)
    if args.json:
        print(json.dumps(res))
    else:
        print(f"{'Es/N0 dB':>9} {'ok':>5} {'success':>8} {'post-FEC BER':>13} {'vit corr':>9}")
        for r in res:
            ber = "0" if r["post_fec_ber"] == 0 else (
                f"{r['post_fec_ber']:.2e}" if r["post_fec_ber"] else "-"
            )
            vit = f"{r['avg_vit_corrections']:.0f}" if r["avg_vit_corrections"] else "-"
            print(
                f"{r['snr_db']:>9.1f} {r['frames_ok']:>5} "
                f"{r['frame_success']:>8.2f} {ber:>13} {vit:>9}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
