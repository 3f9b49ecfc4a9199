"""Runtime layer tests: config, statistics wire format, dispatchers,
frontends, symbol transport, and the fused receiver app end-to-end."""

import os
import socket
import struct
import threading
import time

import numpy as np
import pytest

from xritdemod_tpu import constants as C
from xritdemod_tpu import tx
from xritdemod_tpu.runtime import config as cfg_mod
from xritdemod_tpu.runtime.dispatchers import BroadcastServer
from xritdemod_tpu.runtime.frontends import CFileFrontend, SampleType, make_frontend
from xritdemod_tpu.runtime.statistics import STRUCT_SIZE, Statistics
from xritdemod_tpu.runtime.symbol_manager import SampleFifo, SymbolSender


class TestConfig:
    def test_roundtrip_and_defaults(self, tmp_path):
        path = str(tmp_path / "xritdemod.cfg")
        cfg, parser = cfg_mod.demod_config_from_file(path)
        assert os.path.exists(path)           # defaults auto-written
        assert cfg.symbol_rate == C.LRIT_SYMBOL_RATE
        assert cfg.pll_alpha == C.CLOCK_ALPHA  # shipped default
        # edit the file, reload, check mode preset override
        with open(path, "a") as f:
            f.write("mode=hrit\nsampleRate=3000000\n")
        cfg2, _ = cfg_mod.demod_config_from_file(path)
        assert cfg2.symbol_rate == C.HRIT_SYMBOL_RATE
        assert cfg2.rrc_alpha == C.HRIT_RRC_ALPHA
        assert cfg2.sample_rate == 3_000_000

    def test_decoder_config(self, tmp_path):
        path = str(tmp_path / "xritdecoder.cfg")
        cfg, parser = cfg_mod.decoder_config_from_file(path)
        assert cfg.mode == "lrit"
        assert parser.get("vChannelPort") == "5001"


class TestStatistics:
    def test_wire_size_matches_reference_struct(self):
        # sizeof(Statistics_st) with #pragma pack(1) (Statistics.h:13-37)
        expected = 1+1+8+2+2+16+1+1+1+8+2+1+8+2048+2048+8+4+4+1+1+1
        assert STRUCT_SIZE == expected
        assert len(Statistics().pack()) == expected

    def test_update_and_pack_fields(self):
        s = Statistics()
        s.update_frame(scid=13, vcid=5, counter=100, vit_errors=12,
                       rs_errors=(1, 0, 2, -1), sync_correlation=60,
                       phase_correction=180, frame_ok=True)
        s.update_frame(scid=13, vcid=5, counter=105, vit_errors=10,
                       rs_errors=(0, 0, 0, 0), sync_correlation=64,
                       phase_correction=0, frame_ok=True)
        assert s.lost_packets == 4            # counter jump 100 -> 105
        raw = s.pack()
        scid, vcid, pkt = struct.unpack_from("<BBQ", raw, 0)
        assert (scid, vcid, pkt) == (13, 5, 105)
        assert s.frame_lock and s.total_packets == 2

    def test_dropped_frame(self):
        s = Statistics()
        s.update_frame(scid=0, vcid=0, counter=0, vit_errors=900,
                       rs_errors=(-1, -1, -1, -1), sync_correlation=47,
                       phase_correction=0, frame_ok=False)
        assert s.dropped_packets == 1 and not s.frame_lock

    def test_pack_parses_with_independent_header_transcription(self):
        """Cross-pin the wire layout: the library's pack() must be read
        back field-for-field by tools/interop_run.py's parser, which is
        transcribed independently from the reference C header
        (Statistics.h:14-36) and shares no code with statistics.py."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "interop_run",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "tools", "interop_run.py"),
        )
        interop = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(interop)

        s = Statistics()
        s.update_frame(scid=13, vcid=5, counter=321, vit_errors=12,
                       rs_errors=(1, 0, 2, -1), sync_correlation=60,
                       phase_correction=180, frame_ok=True)
        s.sync_word = b"\x1a\xcf\xfc\x1d"
        raw = s.pack()
        assert interop.STAT_SIZE == len(raw)
        d = interop.parse_stats(raw)
        assert d["scid"] == 13 and d["vcid"] == 5
        assert d["packet_number"] == 321
        assert d["vit_errors"] == 12
        assert tuple(d["rs_errors"]) == (1, 0, 2, -1)
        assert d["sync_correlation"] == 60
        assert d["phase_correction"] == 180
        assert d["total_packets"] == 1
        assert d["received_per_channel"][5] == 1
        assert d["sync_word"] == b"\x1a\xcf\xfc\x1d"
        assert d["frame_lock"] == 1


class TestBroadcastServer:
    def test_fanout_and_prune(self):
        srv = BroadcastServer(0)  # ephemeral port
        srv.start()
        try:
            port = srv.bound_port
            c1 = socket.create_connection(("127.0.0.1", port), 2)
            c2 = socket.create_connection(("127.0.0.1", port), 2)
            time.sleep(0.2)
            srv.add(b"hello")
            assert c1.recv(5) == b"hello"
            assert c2.recv(5) == b"hello"
            c2.close()
            time.sleep(0.1)
            srv.add(b"world")
            srv.add(b"!!!!!")  # triggers prune of c2
            assert c1.recv(5) == b"world"
            time.sleep(0.2)
            assert srv.num_clients() == 1
        finally:
            srv.stop()


class TestFrontends:
    def test_cfile_plays_capture(self, tmp_path, rng):
        data = (rng.normal(size=200_000) + 1j * rng.normal(size=200_000)).astype(
            np.complex64
        )
        path = str(tmp_path / "cap.bin")
        data.tofile(path)
        fe = CFileFrontend(path)
        got = []
        fe.set_samples_available_callback(lambda iq, t: got.append((iq, t)))
        fe.set_sample_rate(1_250_000)
        fe.start()
        fe.join()
        iq = np.concatenate([g[0] for g in got])
        assert got[0][1] == SampleType.FLOAT_IQ
        assert len(iq) == 2 * len(data)
        np.testing.assert_allclose(iq[0::2], data.real, rtol=1e-6)

    def test_make_frontend_usb_types(self, tmp_path):
        """USB frontends construct by type string (demodulator.cpp:340-428)
        and raise at start() only when the shared library is absent."""
        from xritdemod_tpu.runtime import usb_frontends as uf

        parser = cfg_mod.ConfigParser(str(tmp_path / "x.cfg"))
        parser["filename"] = "x.bin"
        for dtype, cls in (
            ("airspy", uf.AirspyFrontend),
            ("hackrf", uf.HackRFFrontend),
            ("sdrplay", uf.SDRPlayFrontend),
        ):
            fe = make_frontend(dtype, parser)
            assert isinstance(fe, cls)
        with pytest.raises(ValueError):
            make_frontend("nosuchsdr", parser)

    def test_normalize_samples_wire_types(self):
        from xritdemod_tpu.runtime.frontends import normalize_samples

        s16 = np.array([-32768, 0, 16384, 32767], np.int16)
        np.testing.assert_allclose(
            normalize_samples(s16, SampleType.S16_IQ),
            [-1.0, 0.0, 0.5, 32767 / 32768],
        )
        s8 = np.array([-128, 0, 64, 127], np.int8)
        np.testing.assert_allclose(
            normalize_samples(s8, SampleType.S8_IQ),
            [-1.0, 0.0, 0.5, 127 / 128],
        )
        f = np.array([0.25, -0.5], np.float32)
        np.testing.assert_array_equal(
            normalize_samples(f, SampleType.FLOAT_IQ), f
        )

    def test_rtl_lut_matches_reference_formula(self):
        from xritdemod_tpu.runtime.frontends import rtl_u8_lut

        lut = rtl_u8_lut()
        # (i - 128) / 127 (RtlFrontend.cpp:26-28)
        assert lut[128] == 0.0
        np.testing.assert_allclose(lut[255], 127 / 127.0)
        np.testing.assert_allclose(lut[0], -128 / 127.0)

    def test_dc_blocker_matches_scalar_recursion(self, rng):
        from xritdemod_tpu.runtime.frontends import DcBlocker

        fs = 250_000
        n = 10_000
        iq = (rng.normal(0, 0.2, 2 * n) + 0.3).astype(np.float32)
        blk = DcBlocker(fs)
        out = blk.process(iq.copy())
        # scalar golden recursion, separate I/Q rails
        alpha = 1.0 - np.exp(-1.0 / (fs * 0.05))
        ref = np.empty_like(iq)
        avg = [0.0, 0.0]
        for i, x in enumerate(iq.astype(np.float64)):
            r = i % 2
            avg[r] += alpha * (x - avg[r])
            ref[i] = x - avg[r]
        np.testing.assert_allclose(out, ref, atol=1e-6)
        # DC is actually converging out
        assert abs(out[-2000::2].mean()) < abs(iq[0::2].mean())

    def test_rtl_frontend_plays_u8_capture(self, tmp_path, rng):
        from xritdemod_tpu.runtime.frontends import RtlFrontend, rtl_u8_lut

        raw = rng.integers(0, 256, 100_000, dtype=np.uint8)
        path = str(tmp_path / "cap.u8")
        raw.tofile(path)
        fe = RtlFrontend(filename=path)
        got = []
        fe.set_samples_available_callback(lambda iq, t: got.append((iq, t)))
        fe.set_sample_rate(2_560_000)
        fe.start()
        fe.join()
        iq = np.concatenate([g[0] for g in got])
        assert got[0][1] == SampleType.FLOAT_IQ
        assert len(iq) == len(raw)
        # DC blocker is near-identity at alpha~8e-6 over short spans, but
        # output must track LUT[raw] closely and carry both rails
        np.testing.assert_allclose(iq, rtl_u8_lut()[raw], atol=2e-2)

    def test_rtl_frontend_plays_s8_capture(self, tmp_path, rng):
        """signed_input=True: an s8 capture must produce EXACTLY what the
        recentred u8 capture produces ((v ^ 0x80) = v - 128)."""
        from xritdemod_tpu.runtime.frontends import RtlFrontend

        raw_u8 = rng.integers(0, 256, 50_000, dtype=np.uint8)
        s8_path = str(tmp_path / "cap.s8")
        (raw_u8 ^ 0x80).astype(np.uint8).tofile(s8_path)  # same IQ as s8
        u8_path = str(tmp_path / "cap.u8")
        raw_u8.tofile(u8_path)

        def play(fe):
            got = []
            fe.set_samples_available_callback(lambda iq, t: got.append(iq))
            fe.set_sample_rate(2_560_000)
            fe.start()
            fe.join()
            return np.concatenate(got)

        a = play(RtlFrontend(filename=s8_path, signed_input=True))
        b = play(RtlFrontend(filename=u8_path))
        np.testing.assert_array_equal(a, b)

    def test_cli_file_frontend_formats(self):
        from xritdemod_tpu.cli import _file_frontend
        from xritdemod_tpu.runtime.frontends import (
            CFileFrontend, RtlFrontend,
        )

        assert isinstance(_file_frontend("x.raw", "auto", False),
                          CFileFrontend)
        fe = _file_frontend("x.u8", "auto", False)
        assert isinstance(fe, RtlFrontend) and not fe.signed_input
        fe = _file_frontend("x.s8", "auto", True)
        assert isinstance(fe, RtlFrontend) and fe.signed_input
        assert fe.realtime

    def test_rtl_frontend_usb_requires_library(self):
        from xritdemod_tpu.runtime.frontends import RtlFrontend

        with pytest.raises(NotImplementedError):
            RtlFrontend().start()


class TestSymbolTransport:
    def test_sender_reaches_receiver(self):
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        sender = SymbolSender("127.0.0.1", port)
        sender._last_retry = -10
        sender.add(np.arange(-100, 100, dtype=np.int8))
        sender.process()   # connect + send
        conn, _ = srv.accept()
        conn.settimeout(2)
        sender.process()
        data = conn.recv(4096)
        assert np.array_equal(
            np.frombuffer(data, np.int8), np.arange(-100, 100, dtype=np.int8)
        )
        sender.close()
        conn.close()
        srv.close()

    def test_fifo_blocks_and_pops_complex(self):
        fifo = SampleFifo(1 << 16)
        iq = np.arange(8, dtype=np.float32)
        t = threading.Thread(target=lambda: (time.sleep(0.05), fifo.push(iq)))
        t.start()
        x = fifo.pop_block(4, timeout=2.0)
        t.join()
        assert x is not None and x.dtype == np.complex64 or x.dtype == np.complex128
        np.testing.assert_allclose(x.real, [0, 2, 4, 6])
        np.testing.assert_allclose(x.imag, [1, 3, 5, 7])

    def test_fifo_overflow_drops(self):
        fifo = SampleFifo(16)
        fifo.push(np.zeros(12, np.float32))
        fifo.push(np.zeros(12, np.float32))
        assert fifo.overflows == 1


class TestReceiverApp:
    def test_fused_rx_decodes_capture(self, tmp_path, rng):
        """Full app path: synthesized IQ capture file -> frontend -> demod ->
        decode -> statistics + channel dispatch (milestone: 'rx' works)."""
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_demod_chain import make_lrit_signal  # noqa: E402
        from xritdemod_tpu.models.decoder import DecoderConfig
        from xritdemod_tpu.models.demodulator import DemodConfig
        from xritdemod_tpu.runtime.apps import ReceiverApp

        # Build IQ: modulate a real CADU symbol stream through the RRC
        # shaping used by make_lrit_signal's machinery.
        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        vcdus = tx.make_vcdus(30, scid=13, vcid=5, counter0=7, rng=rng)
        symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
        sig = _modulate(symbols, cfg, rng)
        path = str(tmp_path / "cap.bin")
        sig.tofile(path)

        fe = CFileFrontend(path)
        app = ReceiverApp(
            cfg,
            DecoderConfig(mode="lrit", frames_per_block=4),
            fe,
            block_len=1 << 16,
            vchannel_port=0,
            statistics_port=0,
        )
        app.run()
        st = app.decoder_app.stats
        assert st.total_packets >= 16
        assert st.frame_lock
        assert st.scid == 13 and st.vcid == 5
        assert st.dropped_packets <= 1  # acquisition transient only


def _modulate(symbols: np.ndarray, cfg, rng) -> np.ndarray:
    """BPSK-modulate soft symbols (shared fixture, xritdemod_tpu/tx.py)."""
    return tx.modulate(symbols, cfg, rng)


class TestDemodulatorAppBatchPad:
    @pytest.mark.heavy
    def test_batch_pad_matches_serial(self, tmp_path, rng):
        """The single-stream real-time trick (the app pads its one live
        stream into a C-channel batch on device and reads back channel 0;
        auto-on on TPU where the serial scan path is ~0.22x real time)
        must emit the same int8 wire symbols as the serial path — same
        count, bytes equal up to the batch kernels' float rounding in the
        int8 LSB."""
        import socket

        from xritdemod_tpu.models.demodulator import DemodConfig
        from xritdemod_tpu.runtime.apps import DemodulatorApp
        from xritdemod_tpu.runtime.frontends import CFileFrontend

        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        vcdus = tx.make_vcdus(5, scid=13, vcid=5, rng=rng)
        symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
        sig = tx.modulate(symbols, cfg, rng, freq_offset=1e-4, noise=0.02)
        path = str(tmp_path / "cap.bin")
        np.asarray(sig, np.complex64).tofile(path)

        def run(pad):
            srv = socket.socket()
            srv.bind(("127.0.0.1", 0))
            srv.listen(1)
            port = srv.getsockname()[1]
            chunks = []

            def serve():
                conn, _ = srv.accept()
                conn.settimeout(5)
                while True:
                    try:
                        d = conn.recv(1 << 16)
                    except OSError:
                        break
                    if not d:
                        break
                    chunks.append(d)
                conn.close()

            t = threading.Thread(target=serve, daemon=True)
            t.start()
            app = DemodulatorApp(
                cfg,
                CFileFrontend(path),
                decoder_address="127.0.0.1",
                decoder_port=port,
                block_len=1 << 16,
                batch_pad=pad,
            )
            app.run()
            t.join(timeout=10)
            srv.close()
            return np.frombuffer(b"".join(chunks), np.int8), app.symbols_out

        serial, n0 = run(0)
        padded, n1 = run(4)
        assert n0 == len(serial) and n1 == len(padded)
        assert abs(len(serial) - len(padded)) <= 2
        n = min(len(serial), len(padded))
        assert n > 50_000
        d = np.abs(serial[:n].astype(np.int16) - padded[:n].astype(np.int16))
        assert np.mean(d == 0) > 0.995           # LSB rounding only
        assert np.max(d) <= 2


class TestCheckpoint:
    def test_demod_state_roundtrip(self, tmp_path, rng):
        from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
        from xritdemod_tpu.runtime.checkpoint import load_state, save_state

        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        demod = Demodulator(cfg, block_len=1 << 14)
        sig = (rng.normal(size=1 << 14) + 1j * rng.normal(size=1 << 14)).astype(
            np.complex64
        )
        _, _, state = demod.process(sig, demod.init_state())
        path = str(tmp_path / "state.npz")
        save_state(path, state)
        restored = load_state(path, demod.init_state())
        for a, b in zip(
            __import__("jax").tree.leaves(state),
            __import__("jax").tree.leaves(restored),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resumed decode continues identically
        s1, v1, _ = demod.process(sig, state)
        s2, v2, _ = demod.process(sig, restored)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


class TestMetrics:
    def test_rates_and_summary(self):
        from xritdemod_tpu.runtime.metrics import PipelineMetrics

        m = PipelineMetrics(window=60)
        for _ in range(5):
            m.add_samples(1000)
            m.add_frames(2)
            time.sleep(0.01)
        assert m.samples.total == 5000
        assert m.samples.rate() > 0
        assert "Msamp/s" in m.summary()


class TestStatisticsBatch:
    def test_update_batch_matches_sequential(self, rng):
        """update_batch (vectorized, one call per device batch) leaves the
        exact wire state the per-frame update_frame loop does."""
        from xritdemod_tpu.runtime.statistics import Statistics

        B = 64
        scid = rng.integers(0, 64, B)
        vcid = rng.integers(1, 5, B)
        # Per-VCID increasing counters with random gaps (lost packets).
        counter = np.zeros(B, np.int64)
        nxt = {v: int(rng.integers(0, 100)) for v in range(1, 5)}
        for k in range(B):
            v = int(vcid[k])
            nxt[v] += int(rng.integers(1, 4))      # gap 0-2 lost
            counter[k] = nxt[v]
        vit = rng.integers(0, 400, B)
        rse = rng.integers(-1, 17, (B, 4))
        corr = rng.integers(46, 65, B)
        phase = rng.choice([0, 180], B)
        ok = rng.random(B) > 0.2

        a = Statistics(start_time=1000)
        b = Statistics(start_time=1000)
        for k in range(B):
            a.update_frame(
                scid=scid[k], vcid=vcid[k], counter=counter[k],
                vit_errors=vit[k], rs_errors=rse[k],
                sync_correlation=corr[k], phase_correction=phase[k],
                frame_ok=bool(ok[k]),
            )
        b.update_batch(
            scid=scid, vcid=vcid, counter=counter, vit_errors=vit,
            rs_errors=rse, sync_correlation=corr, phase_correction=phase,
            frame_ok=ok,
        )
        assert a.pack() == b.pack()
        # and again (state carries across batches)
        for k in range(B):
            a.update_frame(
                scid=scid[k], vcid=vcid[k], counter=counter[k],
                vit_errors=vit[k], rs_errors=rse[k],
                sync_correlation=corr[k], phase_correction=phase[k],
                frame_ok=bool(ok[k]),
            )
        b.update_batch(
            scid=scid, vcid=vcid, counter=counter, vit_errors=vit,
            rs_errors=rse, sync_correlation=corr, phase_correction=phase,
            frame_ok=ok,
        )
        assert a.pack() == b.pack()


class TestForensics:
    def test_corrupted_frame_dumps_and_fifo_stats(self, tmp_path, rng):
        """A corrupted frame through DecoderApp(dump=True) writes the three
        stage dumps + stats text (ChannelWriter.cpp:25-65 behaviour), and
        the previously-dead fifo-usage stats byte goes nonzero."""
        from xritdemod_tpu.models.decoder import DecoderConfig
        from xritdemod_tpu.runtime.apps import DecoderApp

        vcdus = tx.make_vcdus(5, scid=13, vcid=5, rng=rng)
        soft = tx.encode_stream(vcdus, lrit=True, amp=1.0, noise=0.05, rng=rng)
        # Obliterate the middle of frame 2 (sync survives, RS cannot).
        f2 = 2 * 16384
        soft[f2 + 2000 : f2 + 14000] = rng.normal(
            0, 1.0, 12000
        ).astype(np.float32)
        wire = tx.soft_to_int8(soft * 0.5)

        app = DecoderApp(
            DecoderConfig(mode="lrit", frames_per_block=2),
            vchannel_port=0,
            statistics_port=0,
            dump=True,
            channels_folder=str(tmp_path),
        )
        app.push_symbols(wire)
        app.flush()

        assert app.stats.dropped_packets >= 1
        assert app.stats.total_packets >= 4
        assert app.stats.decoder_fifo_usage > 0
        err = tmp_path / "errors"
        dumps = sorted(p.name for p in err.iterdir())
        stems = {n.rsplit("_", 1)[0] for n in dumps if n.endswith(".bin")}
        assert stems, dumps
        stem = sorted(stems)[0]
        for stage, size in ((0, 16384), (1, 1024), (2, 1020)):
            p = err / f"{stem}_{stage}.bin"
            assert p.exists(), dumps
            assert p.stat().st_size == size
        assert (err / f"{stem}_stats.txt").exists()
        # good frames still land in the channel file
        assert (tmp_path / "channel_5.bin").exists()


class TestRtlUsb:
    def test_usb_loop_with_faked_library(self, rng):
        """Live-USB path driven through a faked librtlsdr handle: device
        programming calls + sync-read chunks -> LUT + DC blocker -> float
        IQ callback (RtlFrontend.cpp:98-118 behaviour)."""
        from xritdemod_tpu.runtime.frontends import (
            DcBlocker,
            RtlFrontend,
            rtl_u8_lut,
        )

        raw = rng.integers(0, 256, 3 * 16384, dtype=np.uint8)

        class FakeLib:
            def __init__(self):
                self.calls = []
                self.pos = 0

            def __getattr__(self, name):
                if name.startswith("rtlsdr_"):
                    def stub(*a, _n=name):
                        self.calls.append(_n)
                        return 0
                    return stub
                raise AttributeError(name)

            def rtlsdr_open(self, devref, index):
                self.calls.append("rtlsdr_open")
                return 0

            def rtlsdr_read_sync(self, dev, buf, length, nref):
                self.calls.append("rtlsdr_read_sync")
                chunk = raw[self.pos : self.pos + length]
                if len(chunk) == 0:
                    nref._obj.value = 0
                    return -1                  # stream end
                buf[: len(chunk)] = bytes(chunk)
                nref._obj.value = len(chunk)
                self.pos += len(chunk)
                return 0

        lib = FakeLib()
        fe = RtlFrontend(library=lib)
        got = []
        fe.set_samples_available_callback(lambda iq, t: got.append(iq))
        fe.set_sample_rate(2_560_000)
        fe.set_center_frequency(1_691_000_000)
        fe.set_lna_gain(14)
        fe.start()
        fe.join()
        for name in ("rtlsdr_open", "rtlsdr_set_sample_rate",
                     "rtlsdr_set_center_freq", "rtlsdr_set_tuner_gain_mode",
                     "rtlsdr_set_tuner_gain", "rtlsdr_reset_buffer",
                     "rtlsdr_read_sync"):
            assert name in lib.calls, (name, lib.calls)
        iq = np.concatenate(got)
        assert len(iq) == len(raw)
        ref = DcBlocker(2_560_000).process(rtl_u8_lut()[raw])
        np.testing.assert_allclose(iq, ref, atol=1e-6)
        fe.stop()
        assert "rtlsdr_close" in lib.calls
