"""Command line: `python -m xritdemod_tpu.cli {demod,decode,rx}`.

Process-level drop-in for the reference's `xritDemodulator` and
`xritDecoder` binaries (same config files, same ports), plus the fused
`rx` mode running the whole receive chain in one process on the TPU.
"""

from __future__ import annotations

import argparse
import sys


def _hook_sigint(app) -> None:
    """Ctrl-C -> graceful stop, second Ctrl-C -> hard exit
    (reference ExitHandler semantics, demodulator.cpp:477-482)."""
    from xritdemod_tpu.runtime.exit_handler import ExitHandler

    ExitHandler.set_callback(lambda sig: app.stop())
    ExitHandler.register_signal()


def _file_frontend(path: str, fmt: str, realtime: bool):
    """Capture-file frontend by sample format: c64 via CFileFrontend
    (GQRX raw, CFileFrontend.cpp:33-62); u8/s8 8-bit interleaved IQ via
    the RTL frontend's playback path (reference LUT normalization)."""
    from xritdemod_tpu.runtime.frontends import CFileFrontend, RtlFrontend

    if fmt == "auto":
        fmt = {"s8": "s8", "u8": "u8"}.get(
            path.rsplit(".", 1)[-1].lower(), "c64")
    if fmt == "c64":
        return CFileFrontend(path, realtime=realtime)
    if fmt in ("u8", "s8"):
        return RtlFrontend(filename=path, realtime=realtime,
                           signed_input=(fmt == "s8"))
    raise SystemExit(f"unknown --format {fmt!r}")


def _demod(args) -> int:
    from xritdemod_tpu.runtime.apps import DemodulatorApp
    from xritdemod_tpu.runtime.config import demod_config_from_file
    from xritdemod_tpu.runtime.frontends import make_frontend

    cfg, parser = demod_config_from_file(args.config)
    device_type = parser.get("deviceType", "cfile")
    if args.file:
        frontend = _file_frontend(args.file, args.format, args.realtime)
    else:
        frontend = make_frontend(device_type, parser)
    app = DemodulatorApp(
        cfg,
        frontend,
        decoder_address=parser.get("decoderAddress", "127.0.0.1"),
        decoder_port=int(parser.get("decoderPort", "5000")),
        send_constellation=parser.get("sendConstellation", "false").lower()
        == "true",
    )
    print(f"xritdemod_tpu demod: {frontend.get_name()}, "
          f"{cfg.symbol_rate} sym/s, sps={cfg.sps:.3f}")
    _hook_sigint(app)
    app.run(max_blocks=args.max_blocks)
    print(f"symbols out: {app.symbols_out}")
    return 0


def _decode(args) -> int:
    from xritdemod_tpu.runtime.apps import DecoderApp
    from xritdemod_tpu.runtime.config import decoder_config_from_file

    cfg, parser = decoder_config_from_file(args.config)
    app = DecoderApp(
        cfg,
        demodulator_port=int(parser.get("demodulatorPort", "5000")),
        vchannel_port=int(parser.get("vChannelPort", "5001")),
        statistics_port=int(parser.get("statisticsPort", "5002")),
        display=args.display or parser.get("display", "false").lower() == "true",
        dump=parser.get("dumpPackets", "false").lower() == "true",
    )
    print(f"xritdemod_tpu decode: mode={cfg.mode}, listening :"
          f"{app.demodulator_port}")
    _hook_sigint(app)
    app.run()
    return 0


def _rx(args) -> int:
    from xritdemod_tpu.models.decoder import DecoderConfig
    from xritdemod_tpu.runtime.apps import ReceiverApp
    from xritdemod_tpu.runtime.config import demod_config_from_file
    from xritdemod_tpu.runtime.frontends import make_frontend

    cfg, parser = demod_config_from_file(args.config)
    mode = parser.get("mode", "lrit")
    if args.file:
        frontend = _file_frontend(args.file, args.format, args.realtime)
    else:
        frontend = make_frontend(parser.get("deviceType", "cfile"), parser)
    app = ReceiverApp(
        cfg,
        DecoderConfig(mode=mode),
        frontend,
        display=args.display,
        dump=args.dump,
    )
    print(f"xritdemod_tpu rx: {frontend.get_name()}, mode={mode}")
    _hook_sigint(app)
    app.run(max_blocks=args.max_blocks)
    st = app.decoder_app.stats
    print(
        f"frames={st.total_packets - st.dropped_packets} "
        f"dropped={st.dropped_packets} lost={st.lost_packets}"
    )
    return 0


def _reprocess(args) -> int:
    """Bulk-reprocess a recorded capture fold-parallel (no pacing, no
    sockets): capture file in -> per-VCID channel files out."""
    import numpy as np

    from xritdemod_tpu.parallel.timeblocks import FoldedCaptureReceiver
    from xritdemod_tpu.runtime.channel_writer import ChannelWriter
    from xritdemod_tpu.runtime.config import demod_config_from_file

    cfg, parser = demod_config_from_file(args.config)
    fmt = args.format
    if fmt == "auto":
        fmt = {"c64": "c64", "cfile": "c64", "raw": "c64",
               "s8": "s8", "u8": "u8"}.get(
            args.file.rsplit(".", 1)[-1].lower(), "c64")
    if fmt == "c64":
        x = np.fromfile(args.file, np.complex64)
        n = len(x)
    elif fmt == "s8":
        # Interleaved signed 8-bit IQ — goes straight onto the int8
        # device wire (utils/cplx.quantize_iq_s8 layout, scale 1/127).
        x = np.fromfile(args.file, np.int8)
        n = len(x) // 2
    elif fmt == "u8":
        # RTL-SDR style unsigned 8-bit IQ: v - 128 recenters to int8
        # exactly ((v ^ 0x80) as signed), matching the reference's
        # (i - 128)/127 LUT (RtlFrontend.cpp:26-28) after the on-device
        # 1/127 dequant.
        x = (np.fromfile(args.file, np.uint8) ^ 0x80).view(np.int8)
        n = len(x) // 2
    else:
        raise SystemExit(f"unknown --format {fmt!r}")
    print(f"xritdemod_tpu reprocess: {n} samples "
          f"({n / cfg.sample_rate:.1f}s of capture, {fmt}), "
          f"folds={args.folds}")
    rx = FoldedCaptureReceiver(cfg, folds=args.folds,
                               block_len=args.block_len)
    frames = rx.process(x)
    writer = ChannelWriter(args.out)
    per_vcid: dict[int, int] = {}
    for scid, vcid, ctr, vcdu in frames:
        writer.write_channel(vcdu, vcid)
        per_vcid[vcid] = per_vcid.get(vcid, 0) + 1
    print(f"frames={len(frames)} vcids=" + ",".join(
        f"{k}:{v}" for k, v in sorted(per_vcid.items())))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="xritdemod_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("demod", help="demodulate IQ -> soft symbols TCP :5000")
    d.add_argument("--config", default="xritdemod.cfg")
    d.add_argument("--file", help="IQ capture (overrides config)")
    d.add_argument("--format", default="auto",
                   choices=["auto", "c64", "s8", "u8"],
                   help="capture sample format (auto = by extension)")
    d.add_argument("--realtime", action="store_true")
    d.add_argument("--max-blocks", type=int, default=None)
    d.set_defaults(fn=_demod)

    c = sub.add_parser("decode", help="decode soft symbols -> VCDUs :5001")
    c.add_argument("--config", default="xritdecoder.cfg")
    c.add_argument("--display", action="store_true")
    c.set_defaults(fn=_decode)

    r = sub.add_parser("rx", help="fused demod+decode in one process")
    r.add_argument("--config", default="xritdemod.cfg")
    r.add_argument("--file", help="IQ capture (overrides config)")
    r.add_argument("--format", default="auto",
                   choices=["auto", "c64", "s8", "u8"],
                   help="capture sample format (auto = by extension)")
    r.add_argument("--realtime", action="store_true")
    r.add_argument("--display", action="store_true")
    r.add_argument("--dump", action="store_true")
    r.add_argument("--max-blocks", type=int, default=None)
    r.set_defaults(fn=_rx)

    g = sub.add_parser(
        "reprocess",
        help="bulk-reprocess a capture fold-parallel -> channel files",
    )
    g.add_argument("file", help="IQ capture (complex64, or raw 8-bit IQ "
                   "with --format s8/u8)")
    g.add_argument("--config", default="xritdemod.cfg")
    g.add_argument("--format", default="auto",
                   choices=["auto", "c64", "s8", "u8"],
                   help="sample format: c64 = complex64 (GQRX raw), s8 = "
                   "interleaved signed 8-bit IQ, u8 = unsigned 8-bit IQ "
                   "(RTL-SDR captures); auto = by file extension")
    g.add_argument("--folds", type=int, default=128)
    g.add_argument("--block-len", type=int, default=1 << 17)
    g.add_argument("--out", default="channels")
    g.set_defaults(fn=_reprocess)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
