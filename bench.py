"""Benchmark harness: one JSON line per run (driver contract).

Headline (default): demod-chain throughput per chip — Msamples/s through the
full BPSK demod chain (AGC -> RRC FIR -> Costas -> M&M clock recovery) on a
channel-batched block, the TPU-native replacement for the reference's
single-stream real-time pipeline.

Selectable via env:
  BENCH_KIND=demod|decode|rx  (default demod; rx = the fused on-device
                               receive, IQ in -> VCDUs out, no host hop)
  BENCH_MODE=lrit|hrit        (default lrit)
  BENCH_SIGNAL=1              (demod kind: feed a locked modulated capture
                               instead of Gaussian noise)
  BENCH_CHANNELS / BENCH_BLOCK / BENCH_ITERS / BENCH_FRAMES

vs_baseline is the multiple of the reference's implied real-time operating
point (BASELINE.md — it publishes no numbers, only "sustain the configured
rate"): LRIT 1.25 Msps input / 293883 sym/s -> 35.87 coded frames/s; HRIT
3.0 Msps / 927000 sym/s -> 113.16 frames/s
(/root/reference/demodulator/src/Parameters.h:17-24,
/root/reference/decoder/src/parameters.h:28-30).
Target from BASELINE.json: >= 100x real time per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

LRIT_RATE = 1_250_000      # reference cfile config input rate (xritdemod.cfg:9)
HRIT_RATE = 3_000_000      # Airspy Mini default (Parameters.h:41)


def _sync(arr):
    # jax.block_until_ready is a NO-OP on the axon backend (see
    # .claude/skills/verify): the only reliable completion barrier is a
    # device->host transfer, so pull one element.
    return float(np.asarray(arr).ravel()[0])


def bench_demod(mode: str):
    import jax
    import jax.numpy as jnp

    from xritdemod_tpu.models.demodulator import DemodConfig
    from xritdemod_tpu.parallel.channels import ChannelDemodulator
    from xritdemod_tpu.utils.cplx import CF32

    # C=2048 x T=131072 measured best on one v5e chip (3025 Msamp/s vs
    # 2857 at C=1024, 2639 at C=512).  The former envelope limits are
    # lifted but slower: T=262144 runs via clock-kernel segmentation
    # (2720 at C=2048) and C=4096 runs via the front-end's in-place-FIR
    # VMEM mode (2784) — both capability points, not the sweet spot.
    C = int(os.environ.get("BENCH_CHANNELS", "2048"))
    T = int(os.environ.get("BENCH_BLOCK", str(1 << 17)))
    iters = int(os.environ.get("BENCH_ITERS", "6"))

    if mode == "hrit":
        cfg = DemodConfig.hrit(sample_rate=HRIT_RATE)
        baseline_msps = HRIT_RATE / 1e6
    else:
        cfg = DemodConfig.lrit(sample_rate=LRIT_RATE)
        baseline_msps = LRIT_RATE / 1e6
    import dataclasses

    K = int(os.environ.get("BENCH_CLOCK_UPDATE", "-1"))
    if K >= 0:
        cfg = dataclasses.replace(cfg, clock_block_update=K)
    ck = os.environ.get("BENCH_CLOCK_KERNEL")
    if ck:
        cfg = dataclasses.replace(cfg, clock_kernel=ck)
    fe = os.environ.get("BENCH_FRONTEND")
    if fe:
        cfg = dataclasses.replace(cfg, frontend_kernel=fe)
    fk = int(os.environ.get("BENCH_FRONTEND_UPDATE", "-1"))
    if fk >= 0:
        cfg = dataclasses.replace(cfg, frontend_block_update=fk)
    fp = os.environ.get("BENCH_FRONTEND_PRECISION")
    if fp:
        cfg = dataclasses.replace(cfg, frontend_precision=fp)
    frows = int(os.environ.get("BENCH_FRONTEND_ROWS", "0"))
    if frows:
        cfg = dataclasses.replace(cfg, frontend_rows=frows)
    finp = int(os.environ.get("BENCH_FIR_INPLACE", "-1"))
    if finp >= 0:
        cfg = dataclasses.replace(cfg, frontend_fir_inplace=finp)
    dec = int(os.environ.get("BENCH_DECIMATION", "0"))
    if dec > 1:
        # The reference's real-SDR operating point: a higher input rate
        # decimated down to the same circuit rate (demodulator.cpp:136-140).
        cfg = dataclasses.replace(
            cfg, sample_rate=cfg.sample_rate * dec, decimation=dec
        )
        baseline_msps *= dec
    ctile = int(os.environ.get("BENCH_CLOCK_TILE", "0"))
    if ctile:
        cfg = dataclasses.replace(cfg, clock_tile=ctile)
    csc = int(os.environ.get("BENCH_CLOCK_SUPERCHUNKS", "0"))
    if csc:
        cfg = dataclasses.replace(cfg, clock_superchunks=csc)
    cch = int(os.environ.get("BENCH_CLOCK_CHUNK", "0"))
    if cch:
        cfg = dataclasses.replace(cfg, clock_chunk=cch)
    cmb = int(os.environ.get("BENCH_CLOCK_MAX_BLOCK", "0"))
    if cmb:
        cfg = dataclasses.replace(cfg, clock_max_block=cmb)
    # Bench operating point = the shipped default: the GR-parity
    # tabulated MMSE interpolator (one-hot MXU row lookup), faster than
    # sinc at every shape tried and DemodConfig's default since round 5
    # (bench, config, and soaks all agree — LONGRUN_r05 vs
    # LONGRUN_MMSE_r05 soak within 5%).  Override with
    # BENCH_CLOCK_INTERP=sinc.
    cin = os.environ.get("BENCH_CLOCK_INTERP", "mmse")
    cfg = dataclasses.replace(cfg, clock_interp=cin)
    demod = ChannelDemodulator(cfg, channels=C, block_len=T)

    rng = np.random.default_rng(0)
    if os.environ.get("BENCH_SIGNAL", "0") == "1":
        # A locked modulated capture (the kernels are static-shape/dense so
        # throughput is data-independent; this point proves it).
        sig = _make_signal_blocks(cfg, T, 1, rng)[0]
        x = CF32(
            jnp.asarray(np.tile(sig.real.astype(np.float32), (C, 1))),
            jnp.asarray(np.tile(sig.imag.astype(np.float32), (C, 1))),
        )
    else:
        x = CF32(
            jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
        )
    state = demod.init_state()

    t0 = time.perf_counter()
    soft, valid, state = demod.process(x, state)
    _sync(soft[0, 0])
    print(f"# compile+first {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # Per-dispatch wall times (includes the ~30 ms fixed host->device
    # tunnel round-trip per sync — NOT representative of streaming
    # throughput, logged for reference only).
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        soft, valid, state = demod.process(x, state)
        _sync(soft[0, 0])
        times.append(time.perf_counter() - t0)

    # Steady-state streaming throughput: queue all steps (device-
    # serialized through the carried state), sync once.  This is how the
    # runtime actually drives the chain — the host never syncs per block —
    # and it amortizes the fixed dispatch round-trip out of the number.
    t0 = time.perf_counter()
    for _ in range(iters):
        soft, valid, state = demod.process(x, state)
    _sync(soft[0, 0])
    pipelined = (time.perf_counter() - t0) / iters

    best = min(min(times), pipelined)
    msps = C * T / best / 1e6
    suffix = "" if mode == "lrit" else f"_{mode}"
    print(
        json.dumps(
            {
                "metric": f"demod_chain_throughput_per_chip{suffix}",
                "value": round(msps, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / baseline_msps, 1),
            }
        )
    )
    print(
        f"# kind=demod mode={mode} channels={C} block={T} iters={iters} "
        f"times={[round(t, 3) for t in times]} "
        f"pipelined={pipelined:.3f} backend={jax.default_backend()}",
        file=sys.stderr,
    )


def _make_signal_blocks(cfg, T, nblocks, rng, lrit=True):
    """Contiguous modulated capture carrying real CADU frames, split into
    `(T,)` complex64 blocks (the locked-signal bench input)."""
    from xritdemod_tpu import tx

    total = nblocks * T
    nframes = int(total / cfg.sps / 16384) + 3
    vcdus = tx.make_vcdus(nframes, scid=13, vcid=5, rng=rng)
    symbols = tx.encode_stream(vcdus, lrit=lrit, amp=1.0, rng=rng)
    sig = tx.modulate(symbols, cfg, rng)
    assert len(sig) >= total, (len(sig), total)
    return [sig[i * T : (i + 1) * T] for i in range(nblocks)]


def bench_rx(mode: str):
    """Whole-receive throughput, fully on-device: IQ in -> VCDUs out
    (demod chain -> per-channel symbol ring -> sync -> Viterbi -> RS) with
    no host symbol hop, pipelined through the carried state."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from xritdemod_tpu.models.decoder import DecoderConfig
    from xritdemod_tpu.models.demodulator import DemodConfig
    from xritdemod_tpu.models.receiver import FusedReceiver
    from xritdemod_tpu.utils.cplx import CF32

    # C=2048 matches the demod sweet spot and measured best here too
    # (2255 Msamp/s vs 2152 at C=1024).  Input residency is governed by
    # BENCH_RX_BCAST below (default: distinct resident (C, T) buffers).
    C_ = int(os.environ.get("BENCH_CHANNELS", "2048"))
    T = int(os.environ.get("BENCH_BLOCK", str(1 << 17)))
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    # 4 distinct resident (C, T) blocks (~8.4 GB at C=2048) keep the input
    # reads honest while fitting HBM; the (1, T)-broadcast mode measured
    # SLOWER (2330 vs 2354 Msamp/s — the in-jit broadcast materialization
    # costs more than reading resident buffers), kept only for C=4096+.
    nblocks = min(iters, int(os.environ.get("BENCH_RX_BLOCKS", "4")))
    bcast = os.environ.get("BENCH_RX_BCAST", "0") == "1"

    if mode == "hrit":
        cfg = DemodConfig.hrit(sample_rate=HRIT_RATE)
        baseline_msps = HRIT_RATE / 1e6
    else:
        cfg = DemodConfig.lrit(sample_rate=LRIT_RATE)
        baseline_msps = LRIT_RATE / 1e6
    # MMSE tap path: measured faster here too (2427.8 vs 2403 Msamp/s at
    # C=2048 in round 4); see the demod bench note.
    cin = os.environ.get("BENCH_CLOCK_INTERP", "mmse")
    cfg = dataclasses.replace(cfg, clock_interp=cin)
    rx = FusedReceiver(
        cfg,
        DecoderConfig(mode=mode),
        channels=C_,
        block_len=T,
        ring_dtype=os.environ.get("BENCH_RING", "auto"),
    )
    rng = np.random.default_rng(0)
    blocks = _make_signal_blocks(cfg, T, nblocks, rng, lrit=mode == "lrit")
    # Keep each block device-resident as ONE (1, T) row and broadcast to
    # (C, T) inside the jitted step: all channels carry the same capture
    # anyway (np.tile before), and nblocks resident (C, T) f32 pairs OOM
    # HBM at C=2048 (6 x 2 GB).  The broadcast materializes transiently in
    # the step's arena, one execution at a time.
    if bcast:
        xs = [
            CF32(
                jnp.asarray(b.real.astype(np.float32)[None, :]),
                jnp.asarray(b.imag.astype(np.float32)[None, :]),
            )
            for b in blocks
        ]
        rx_step = jax.jit(
            lambda x, st: rx._step_impl(
                CF32(
                    jnp.broadcast_to(x.re, (C_, T)),
                    jnp.broadcast_to(x.im, (C_, T)),
                ),
                st,
            )
        )
    elif os.environ.get("BENCH_LAYOUT", "row") == "cl":
        # Channels-last ingest: time-major (T, C) resident blocks feed the
        # fused front-end kernel's native layout directly — no device-side
        # input transpose (FusedReceiver.step_cl).
        xs = [
            CF32(
                jnp.asarray(
                    np.tile(b.real.astype(np.float32)[:, None], (1, C_))
                ),
                jnp.asarray(
                    np.tile(b.imag.astype(np.float32)[:, None], (1, C_))
                ),
            )
            for b in blocks
        ]
        rx_step = rx._step_cl
    else:
        # Honest variant: distinct materialized (C, T) buffers (real input
        # HBM reads).  BENCH_RX_BLOCKS must be small enough to fit.
        xs = [
            CF32(
                jnp.asarray(np.tile(b.real.astype(np.float32), (C_, 1))),
                jnp.asarray(np.tile(b.imag.astype(np.float32), (C_, 1))),
            )
            for b in blocks
        ]
        rx_step = rx._step
    st = rx.init_state()

    t0 = time.perf_counter()
    batch, ok, ovf, st = rx_step(xs[0], st)
    _sync(batch.vit_errors[0, 0])
    print(f"# compile+first {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    # lock-in warmup
    for i in (1, 2):
        batch, ok, ovf, st = rx_step(xs[i % nblocks], st)
    _sync(batch.vit_errors[0, 0])

    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        batch, ok, ovf, st = rx_step(xs[(3 + i) % nblocks], st)
        outs.append((batch.frame_ok, ok))
    _sync(batch.vit_errors[0, 0])
    dt = (time.perf_counter() - t0) / iters

    good = sum(int(np.asarray(f).sum()) for f, _ in outs)
    popped = sum(int(np.asarray(o).sum()) for _, o in outs)
    msps = C_ * T / dt / 1e6
    fps = good / (dt * iters)
    assert good > 0.5 * popped, f"rx integrity: {good}/{popped} frames ok"
    suffix = "" if mode == "lrit" else f"_{mode}"
    print(
        json.dumps(
            {
                "metric": f"rx_throughput_per_chip{suffix}",
                "value": round(msps, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / baseline_msps, 1),
            }
        )
    )
    print(
        f"# kind=rx mode={mode} channels={C_} block={T} k={rx.k} "
        f"ring={rx.ring_len} iters={iters} pipelined={dt:.3f} "
        f"frames/s={fps:.0f} good={good}/{popped} "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )


def bench_decode(mode: str):
    """CADU decode chain throughput: coded frames/s through sync readout +
    Viterbi + NRZ-M + derandomize + RS(255,223)x4 on batched frames."""
    import jax

    from xritdemod_tpu import constants as C
    from xritdemod_tpu import tx
    from xritdemod_tpu.models.decoder import CaduDecoder, DecoderConfig

    B = int(os.environ.get("BENCH_FRAMES", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    lrit = mode == "lrit"

    vcdus = tx.make_vcdus(B, rng=np.random.default_rng(1))
    soft = tx.encode_stream(vcdus, lrit=lrit, noise=0.1)
    if os.environ.get("BENCH_RS_ERRORED", "0") == "1":
        # Force the RS errored path: strong 30-symbol inversion bursts
        # punch correctable byte errors through Viterbi into every frame,
        # so the zero-syndrome fast path never fires and the full
        # BM/Chien/Forney cost is measured (the clean-path default is the
        # steady-state number; this point is its worst-case counterpart).
        rng_e = np.random.default_rng(7)
        soft = soft.reshape(B, 16384).copy()
        for f in range(B):
            for pos in rng_e.integers(700, 15600, size=12):
                soft[f, pos : pos + 30] *= -1.0
        soft = soft.reshape(-1)
    elif os.environ.get("BENCH_RS_SPARSE", "0") == "1":
        # Sparse-error point: ~1% of frames carry correctable bursts — the
        # realistic mostly-clean stream.  The errored-subset compaction
        # (ops/reed_solomon.py rs_decode sparse path) corrects only the
        # errored rows, so this should land near the clean number rather
        # than the all-errored one.
        rng_e = np.random.default_rng(7)
        soft = soft.reshape(B, 16384).copy()
        for f in rng_e.choice(B, size=max(1, B // 100), replace=False):
            for pos in rng_e.integers(700, 15600, size=12):
                soft[f, pos : pos + 30] *= -1.0
        soft = soft.reshape(-1)
    import jax.numpy as jnp

    soft_dev = jnp.asarray(soft)

    segs = int(os.environ.get("BENCH_VIT_SEGMENTS", "-1"))
    dec = CaduDecoder(
        DecoderConfig(mode=mode, frames_per_block=B, viterbi_segments=segs)
    )
    tail = dec.init_tail()

    t0 = time.perf_counter()
    batch, tail = dec.decode_block(soft_dev, tail)
    _sync(batch.vit_errors)
    print(f"# compile+first {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    ok = int(np.asarray(batch.frame_ok).sum())
    assert ok == B, f"decode bench integrity: {ok}/{B} frames ok"
    if (os.environ.get("BENCH_RS_ERRORED", "0") == "1"
            or os.environ.get("BENCH_RS_SPARSE", "0") == "1"):
        nerr = int(np.clip(np.asarray(batch.rs_errors), 0, None).sum())
        assert nerr > 0, "errored-path bench made no RS corrections"
        print(f"# rs corrections: {nerr}", file=sys.stderr)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        batch, tail = dec.decode_block(soft_dev, tail)
        _sync(batch.vit_errors)
        times.append(time.perf_counter() - t0)

    # Steady-state streaming: queue all blocks (serialized through the
    # carried Viterbi tail), sync once — amortizes the fixed ~30 ms
    # per-dispatch tunnel round-trip like the demod bench.
    t0 = time.perf_counter()
    for _ in range(iters):
        batch, tail = dec.decode_block(soft_dev, tail)
    _sync(batch.vit_errors)
    pipelined = (time.perf_counter() - t0) / iters

    best = min(min(times), pipelined)
    fps = B / best
    # Reference real-time operating point: symbolRate / FRAMEBITS frames/s
    # (decoder/src/parameters.h:28-30).
    sym_rate = C.LRIT_SYMBOL_RATE if lrit else C.HRIT_SYMBOL_RATE
    baseline_fps = sym_rate / C.FRAME_BITS
    suffix = "" if lrit else f"_{mode}"
    print(
        json.dumps(
            {
                "metric": f"decode_chain_throughput_per_chip{suffix}",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 1),
            }
        )
    )
    print(
        f"# kind=decode mode={mode} frames={B} iters={iters} "
        f"times={[round(t, 3) for t in times]} pipelined={pipelined:.3f} "
        f"coded_Msym/s={B * C.CODED_FRAME_SIZE / best / 1e6:.1f} "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )


def main():
    kind = os.environ.get("BENCH_KIND", "demod")
    mode = os.environ.get("BENCH_MODE", "lrit")
    if kind == "decode":
        bench_decode(mode)
    elif kind == "rx":
        bench_rx(mode)
    else:
        bench_demod(mode)


if __name__ == "__main__":
    main()
