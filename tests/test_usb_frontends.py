"""USB frontend bindings (Airspy / HackRF / SDRPlay) driven through faked
ctypes library handles — device programming sequences and sample delivery,
no hardware required (reference behavior: AirspyDevice.cpp,
HackRFFrontend.cpp, SDRPlayFrontend.cpp)."""

import ctypes
from ctypes import POINTER, c_float, c_short, c_ubyte

import numpy as np
import pytest

from xritdemod_tpu.runtime.frontends import DcBlocker, SampleType
from xritdemod_tpu.runtime import usb_frontends as uf


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class _RecordingLib:
    """Base fake: records every prefixed call, returns success."""

    PREFIX = ""

    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        if name.startswith(self.PREFIX):
            def stub(*a, _n=name):
                self.calls.append(_n)
                return 0
            return stub
        raise AttributeError(name)


class FakeAirspy(_RecordingLib):
    PREFIX = "airspy_"

    def __init__(self, samples: np.ndarray, dropped: int = 3):
        super().__init__()
        self.samples = samples  # float32 interleaved IQ
        self.dropped = dropped
        self.rx_cb = None
        self.delivered = False

    def airspy_board_id_read(self, dev, bref):
        self.calls.append("airspy_board_id_read")
        bref._obj.value = 1
        return 0

    def airspy_version_string_read(self, dev, buf, n):
        self.calls.append("airspy_version_string_read")
        buf.value = b"AirSpy MINI v1.0.0-rc10"
        return 0

    def airspy_board_partid_serialno_read(self, dev, sref):
        self.calls.append("airspy_board_partid_serialno_read")
        ser = sref._obj
        ser.part_id[0], ser.part_id[1] = 0x6906002B, 0x00000030
        ser.serial_no[2], ser.serial_no[3] = 0xDEAD, 0xBEEF
        return 0

    def airspy_get_samplerates(self, dev, out, n):
        self.calls.append("airspy_get_samplerates")
        if isinstance(n, int) and n == 0:  # count query
            out._obj.value = 2
        else:
            out[0], out[1] = 6_000_000, 3_000_000
        return 0

    def airspy_start_rx(self, dev, cb, ctx):
        self.calls.append("airspy_start_rx")
        self.rx_cb = cb
        if not self.delivered:  # deliver once (restart dance re-arms only)
            self.delivered = True
            half = len(self.samples) // 4 * 2
            for chunk, drop in ((self.samples[:half], 0),
                                (self.samples[half:], self.dropped)):
                buf = (c_float * len(chunk))(*chunk.tolist())
                t = uf.AirspyTransfer(
                    samples=ctypes.cast(buf, ctypes.c_void_p),
                    sample_count=len(chunk) // 2,
                    dropped_samples=drop,
                    sample_type=uf.AIRSPY_SAMPLE_FLOAT32_IQ,
                )
                cb(ctypes.pointer(t))
        return 0


class TestAirspy:
    def test_probe_stream_and_controls(self, rng):
        samples = rng.normal(size=4096).astype(np.float32)
        lib = FakeAirspy(samples)
        fe = uf.AirspyFrontend(library=lib)
        got = []
        fe.set_samples_available_callback(lambda iq, t: got.append((iq, t)))
        fe.start()
        # Device probe (AirspyDevice.cpp:49-128)
        assert fe.board_id == 1
        assert "rc10" in fe.firmware_version
        assert fe.serial_number == "0xdeadbeef"
        assert fe.available_sample_rates == [6_000_000, 3_000_000]
        assert fe.sample_rate == 6_000_000  # defaults to first listed
        assert fe.get_name() == "AirSpy(1) - 0xdeadbeef"
        for name in ("airspy_open", "airspy_set_sample_type",
                     "airspy_set_samplerate", "airspy_set_freq",
                     "airspy_set_lna_gain", "airspy_set_mixer_gain",
                     "airspy_set_vga_gain", "airspy_start_rx"):
            assert name in lib.calls, (name, lib.calls)
        # Native float IQ passthrough, FLOAT_IQ type, dropped counter
        iq = np.concatenate([g[0] for g in got])
        np.testing.assert_array_equal(iq, samples)
        assert all(t == SampleType.FLOAT_IQ for _, t in got)
        assert fe.dropped_samples == 3  # AirspyDevice.cpp:256-259

    def test_frequency_clamp(self):
        """24 MHz..1.75 GHz clamp (AirspyDevice.cpp:244-254)."""
        fe = uf.AirspyFrontend(library=FakeAirspy(np.zeros(4, np.float32)))
        assert fe.set_center_frequency(1_000_000) == 24_000_000
        assert fe.set_center_frequency(2_000_000_000) == 1_750_000_000
        assert fe.set_center_frequency(1_691_000_000) == 1_691_000_000
        assert fe.get_center_frequency() == 1_691_000_000

    def test_rate_change_restarts_stream(self):
        """Mid-stream rate change = stop/set/start (AirspyDevice.cpp:219)."""
        lib = FakeAirspy(np.zeros(4, np.float32))
        fe = uf.AirspyFrontend(library=lib)
        fe.set_samples_available_callback(lambda iq, t: None)
        fe.start()
        lib.calls.clear()
        fe.set_sample_rate(3_000_000)
        assert lib.calls == ["airspy_stop_rx", "airspy_set_samplerate",
                             "airspy_start_rx"]
        assert fe.sample_rate == 3_000_000
        fe.stop()
        assert "airspy_close" in lib.calls

    def test_agc_toggle(self):
        """AGC on = lna+mixer agc; off restores manual gains
        (AirspyDevice.cpp:158-166)."""
        lib = FakeAirspy(np.zeros(4, np.float32))
        fe = uf.AirspyFrontend(library=lib)
        fe.set_samples_available_callback(lambda iq, t: None)
        fe.start()
        lib.calls.clear()
        fe.set_agc(True)
        assert lib.calls == ["airspy_set_lna_agc", "airspy_set_mixer_agc"]
        lib.calls.clear()
        fe.set_agc(False)
        assert lib.calls == ["airspy_set_lna_agc", "airspy_set_mixer_agc",
                             "airspy_set_lna_gain", "airspy_set_mixer_gain"]


class FakeHackRF(_RecordingLib):
    PREFIX = "hackrf_"

    def __init__(self, raw: np.ndarray):
        super().__init__()
        self.raw = raw  # uint8-viewed signed IQ bytes

    def hackrf_start_rx(self, dev, cb, ctx):
        self.calls.append("hackrf_start_rx")
        for chunk in np.array_split(self.raw, 3):
            buf = (c_ubyte * len(chunk))(*chunk.tolist())
            t = uf.HackRFTransfer(
                buffer=ctypes.cast(buf, POINTER(c_ubyte)),
                buffer_length=len(chunk),
                valid_length=len(chunk),
            )
            cb(ctypes.pointer(t))
        return 0


class TestHackRF:
    def test_stream_s8_lut_dc_blocker(self, rng):
        """Signed-8 LUT + two-rail DC blocker -> FLOAT_IQ (the working
        version of HackRFFrontend.cpp:33-58; signedness + `i%1` fixed)."""
        raw = rng.integers(0, 256, 6144, dtype=np.uint8)
        lib = FakeHackRF(raw)
        fe = uf.HackRFFrontend(library=lib)
        got = []
        fe.set_samples_available_callback(lambda iq, t: got.append((iq, t)))
        fe.set_sample_rate(10_000_000)
        fe.set_center_frequency(1_691_000_000)
        fe.set_lna_gain(24)
        fe.set_vga_gain(10)
        fe.start()
        for name in ("hackrf_init", "hackrf_open", "hackrf_set_sample_rate",
                     "hackrf_set_freq", "hackrf_set_lna_gain",
                     "hackrf_set_vga_gain", "hackrf_start_rx"):
            assert name in lib.calls, (name, lib.calls)
        iq = np.concatenate([g[0] for g in got])
        ref = DcBlocker(10_000_000).process(uf.hackrf_s8_lut()[raw])
        np.testing.assert_allclose(iq, ref, atol=1e-6)
        assert all(t == SampleType.FLOAT_IQ for _, t in got)
        fe.stop()
        assert "hackrf_stop_rx" in lib.calls
        assert "hackrf_close" in lib.calls

    def test_s8_lut_is_signed(self):
        """int8 decode: byte 0x01 -> +1/128 (the reference's disabled code
        would map it to -1.0 via the unsigned RTL LUT)."""
        lut = uf.hackrf_s8_lut()
        assert lut[1] == pytest.approx(1 / 128)
        assert lut[0x80] == pytest.approx(-1.0)
        assert lut[0xFF] == pytest.approx(-1 / 128)

    def test_amp_rides_mixer_gain(self):
        lib = FakeHackRF(np.zeros(2, np.uint8))
        fe = uf.HackRFFrontend(library=lib)
        fe.set_samples_available_callback(lambda iq, t: None)
        fe.start()
        lib.calls.clear()
        fe.set_mixer_gain(1)
        assert lib.calls == ["hackrf_set_amp_enable"]


class FakeMirSdr(_RecordingLib):
    PREFIX = "mir_sdr_"

    def __init__(self, xi: np.ndarray, xq: np.ndarray):
        super().__init__()
        self.xi, self.xq = xi, xq
        self.stream_args = None

    def mir_sdr_StreamInit(self, gr, fs, rf, bw, ifk, lna, grsys, mode,
                           spp, stream_cb, gc_cb, ctx):
        self.calls.append("mir_sdr_StreamInit")
        self.stream_args = (float(fs.value), float(rf.value), bw, ifk, lna,
                            mode)
        gr._obj.value = 42
        grsys._obj.value = 85
        spp._obj.value = 504
        n = len(self.xi)
        xi = (c_short * n)(*self.xi.tolist())
        xq = (c_short * n)(*self.xq.tolist())
        stream_cb(xi, xq, 0, 0, 0, 0, n, 0, None)
        return 0


class TestSDRPlay:
    def test_stream_init_and_split_rail_delivery(self, rng):
        """StreamInit parameters (SDRPlayFrontend.cpp:117) and split-rail
        s16 -> interleaved float /32768 (:29-36)."""
        xi = rng.integers(-32768, 32768, 1024, dtype=np.int16)
        xq = rng.integers(-32768, 32768, 1024, dtype=np.int16)
        lib = FakeMirSdr(xi, xq)
        fe = uf.SDRPlayFrontend(library=lib)
        got = []
        fe.set_samples_available_callback(lambda iq, t: got.append((iq, t)))
        fe.set_sample_rate(10_000_000)
        fe.set_center_frequency(1_691_000_000)
        fe.start()
        fs, rf, bw, ifk, lna, mode = lib.stream_args
        assert fs == pytest.approx(10.0)        # MHz
        assert rf == pytest.approx(1691.0)      # MHz
        assert (bw, ifk, lna, mode) == (uf.MIR_SDR_BW_5_000,
                                        uf.MIR_SDR_IF_ZERO, 4,
                                        uf.MIR_SDR_USE_RSP_SET_GR)
        assert fe.gr_db == 42 and fe.gr_db_system == 85
        assert fe.samples_per_packet == 504
        (iq, t), = got
        assert t == SampleType.FLOAT_IQ
        np.testing.assert_allclose(iq[0::2], xi.astype(np.float32) / 32768)
        np.testing.assert_allclose(iq[1::2], xq.astype(np.float32) / 32768)
        fe.stop()
        assert "mir_sdr_StreamUninit" in lib.calls

    def test_initialize_and_agc(self):
        """1st-LO + decimation setup (:60-71), AgcControl (:152-154)."""
        lib = FakeMirSdr(np.zeros(1, np.int16), np.zeros(1, np.int16))
        fe = uf.SDRPlayFrontend(library=lib)
        fe.initialize()
        assert lib.calls == ["mir_sdr_SetParam", "mir_sdr_DecimateControl"]
        lib.calls.clear()
        fe.set_agc(True)
        fe.set_agc(False)
        assert lib.calls == ["mir_sdr_AgcControl", "mir_sdr_AgcControl"]
        fe.set_antenna(1)
        assert lib.calls[-1] == "mir_sdr_AmPortSelect"
        assert fe.get_name().startswith("SDRPlay OSP Plugin")


class TestLibraryAbsent:
    def test_start_raises_only_without_library(self, monkeypatch):
        for cls, loader in ((uf.AirspyFrontend, "load_libairspy"),
                            (uf.HackRFFrontend, "load_libhackrf"),
                            (uf.SDRPlayFrontend, "load_libmirsdr")):
            monkeypatch.setattr(uf, loader, lambda: None)
            with pytest.raises(NotImplementedError):
                cls().start()
