#!/usr/bin/env python3
"""Quantify the segmented Viterbi's correctness margin vs the exact decoder.

The TPU decode default is segment-parallel Viterbi
(ops/viterbi_pallas.viterbi_decode_segmented): each frame's 8224 trellis
steps decode as S overlapped windows whose `overlap`-step warmup is an
approximation that degrades at low SNR.  This sweep runs BOTH kernels (the
real compiled ones — run on TPU) over real CADU streams across Es/N0 and
reports, per (snr, S, overlap):

  - bit_mismatch: fraction of survivor bits where segmented != exact
  - frame_success_{seg,exact}: post-FEC frame success through the full
    decode chain for each kernel
  - frames where the two chains' VCDUs differ

Writes VITERBI_MARGIN_r02.json when --json PATH is given.

Usage (TPU): python tools/viterbi_margin_sweep.py --frames 64 \
    --snrs -1,0,1,2,3,5 --segments 4,8,16 --overlaps 64,128,256 \
    --json VITERBI_MARGIN_r02.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def run(nframes, snrs, seg_list, ov_list, seed=0):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from xritdemod_tpu import tx
    from xritdemod_tpu.models.decoder import CaduDecoder, DecoderConfig
    from xritdemod_tpu.ops.viterbi_pallas import (
        viterbi_decode_pallas,
        viterbi_decode_segmented,
    )

    interp = jax.default_backend() != "tpu"
    if interp:
        print("# WARNING: not on TPU — interpret mode, slow", file=sys.stderr)
    results = []
    base = DecoderConfig(mode="lrit", frames_per_block=nframes)
    dec_exact = CaduDecoder(dataclasses.replace(base, viterbi_segments=0))
    # One decoder per (S, overlap), reused across SNR points (each holds
    # its own jit cache — creating them per point would recompile).
    dec_seg = {
        (S, ov): CaduDecoder(dataclasses.replace(
            base, viterbi_segments=S, viterbi_overlap=ov
        ))
        for S in seg_list
        for ov in ov_list
    }

    for snr_db in snrs:
        sigma = float(10 ** (-snr_db / 20) / np.sqrt(2))
        rng = np.random.default_rng(seed)
        vcdus = tx.make_vcdus(nframes, scid=13, vcid=5, rng=rng)
        soft = tx.encode_stream(vcdus, lrit=True, amp=1.0, noise=sigma, rng=rng)
        soft_dev = jnp.asarray(soft)

        # Extended frames exactly as the decode chain builds them.
        frames = soft.reshape(nframes, 16384)
        prev = np.concatenate(
            [np.zeros((1, 64), np.float32), frames[:-1, -64:]], axis=0
        )
        ext = jnp.asarray(np.concatenate([prev, frames], axis=1))

        bits_exact, _ = viterbi_decode_pallas(ext, interpret=interp)
        bits_exact = np.asarray(bits_exact)
        b_ex, _ = dec_exact.decode_block(soft_dev, dec_exact.init_tail())
        ok_ex = np.asarray(b_ex.frame_ok)
        vc_ex = np.asarray(b_ex.vcdu)
        match_ex = np.array(
            [ok_ex[k] and np.array_equal(vc_ex[k], vcdus[k])
             for k in range(nframes)]
        )

        for S in seg_list:
            for ov in ov_list:
                bits_seg, _ = viterbi_decode_segmented(
                    ext, segments=S, overlap=ov, interpret=interp
                )
                mism = float((np.asarray(bits_seg) != bits_exact).mean())
                d = dec_seg[(S, ov)]
                b_sg, _ = d.decode_block(soft_dev, d.init_tail())
                ok_sg = np.asarray(b_sg.frame_ok)
                vc_sg = np.asarray(b_sg.vcdu)
                match_sg = np.array(
                    [ok_sg[k] and np.array_equal(vc_sg[k], vcdus[k])
                     for k in range(nframes)]
                )
                row = {
                    "snr_db": float(snr_db),
                    "segments": S,
                    "overlap": ov,
                    "bit_mismatch": mism,
                    "frame_success_exact": float(match_ex.mean()),
                    "frame_success_seg": float(match_sg.mean()),
                    "frames_diverged": int((match_sg != match_ex).sum()),
                }
                results.append(row)
                print(
                    f"snr={snr_db:+.0f}dB S={S:>2} ov={ov:>3}: "
                    f"bit_mismatch={mism:.2e} "
                    f"success seg={row['frame_success_seg']:.3f} "
                    f"exact={row['frame_success_exact']:.3f} "
                    f"diverged={row['frames_diverged']}",
                    file=sys.stderr,
                )
    return results


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--snrs", default="-1,0,1,2,3,5")
    p.add_argument("--segments", default="4,8,16")
    p.add_argument("--overlaps", default="64,128,256")
    p.add_argument("--json", default=None)
    args = p.parse_args()
    res = run(
        args.frames,
        [float(s) for s in args.snrs.split(",")],
        [int(s) for s in args.segments.split(",")],
        [int(s) for s in args.overlaps.split(",")],
    )
    if args.json:
        import jax

        out = {
            "backend": jax.default_backend(),
            "frames_per_point": args.frames,
            "results": res,
        }
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}", file=sys.stderr)
    else:
        print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
