"""Sample sources: the FrontendDevice interface and the file frontend.

Mirrors the reference's frontend abstraction
(/root/reference/demodulator/src/FrontendDevice.h:19-38): rate/frequency/
gain control plus push-callback sample delivery in one of three wire types.
Hardware-USB frontends (Airspy/RTLSDR/HackRF/SDRPlay) are host-USB devices
out of TPU scope; the interface keeps them pluggable, and `CFileFrontend`
(recorded-capture playback, CFileFrontend.cpp:33-62 — the reference's de
facto integration test) and the SpyServer network client
(runtime/spyserver.py) are implemented.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable

import numpy as np

__all__ = ["SampleType", "FrontendDevice", "CFileFrontend", "make_frontend"]


class SampleType:
    FLOAT_IQ = 0
    S16_IQ = 1
    S8_IQ = 2


Callback = Callable[[np.ndarray, int], None]  # (interleaved samples, type)


class FrontendDevice:
    """Abstract SDR source (FrontendDevice.h contract)."""

    def set_sample_rate(self, rate: int) -> int:
        raise NotImplementedError

    def set_center_frequency(self, freq: int) -> int:
        raise NotImplementedError

    def get_center_frequency(self) -> int:
        raise NotImplementedError

    def get_name(self) -> str:
        raise NotImplementedError

    def set_agc(self, enabled: bool) -> None:
        pass

    def set_lna_gain(self, gain: int) -> None:
        pass

    def set_vga_gain(self, gain: int) -> None:
        pass

    def set_mixer_gain(self, gain: int) -> None:
        pass

    def set_biast(self, enabled: bool) -> None:
        pass

    def set_samples_available_callback(self, cb: Callback) -> None:
        self._cb = cb

    def start(self) -> None:
        raise NotImplementedError

    def stop(self) -> None:
        raise NotImplementedError


class CFileFrontend(FrontendDevice):
    """Recorded complex64 capture playback (CFileFrontend.cpp:33-62).

    Reads BUFFERSIZE-sample chunks; with `realtime=True` paces delivery to
    the configured sample rate by wall clock like the reference
    (fPeriod = BUFFERSIZE/sampleRate); stops at EOF.
    """

    BUFFER_SIZE = 65536

    def __init__(self, filename: str, realtime: bool = False):
        self.filename = filename
        self.realtime = realtime
        self.sample_rate = 0
        self.center_frequency = 0
        self._cb: Callback | None = None
        self._thread: threading.Thread | None = None
        self._running = False

    def set_sample_rate(self, rate: int) -> int:
        self.sample_rate = rate
        return rate

    def set_center_frequency(self, freq: int) -> int:
        self.center_frequency = freq
        return freq

    def get_center_frequency(self) -> int:
        return self.center_frequency

    def get_name(self) -> str:
        return f"CFileFrontend ({os.path.basename(self.filename)})"

    def start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread:
            self._thread.join(timeout=5)

    def join(self) -> None:
        if self._thread:
            self._thread.join()

    @property
    def running(self) -> bool:
        return self._running

    def _loop(self) -> None:
        period = (
            self.BUFFER_SIZE / self.sample_rate
            if (self.realtime and self.sample_rate)
            else 0.0
        )
        with open(self.filename, "rb") as f:
            while self._running:
                t0 = time.monotonic()
                raw = f.read(self.BUFFER_SIZE * 8)  # complex64
                if not raw:
                    break
                data = np.frombuffer(raw, np.complex64)
                iq = np.empty(2 * len(data), np.float32)
                iq[0::2] = data.real
                iq[1::2] = data.imag
                if self._cb is not None:
                    self._cb(iq, SampleType.FLOAT_IQ)
                if period:
                    dt = period - (time.monotonic() - t0)
                    if dt > 0:
                        time.sleep(dt)
        self._running = False


def make_frontend(device_type: str, cfg) -> FrontendDevice:
    """Frontend construction by config string (demodulator.cpp:340-428)."""
    device_type = device_type.lower()
    if device_type == "cfile":
        return CFileFrontend(cfg.get("filename"))
    if device_type == "spyserver":
        from xritdemod_tpu.runtime.spyserver import SpyServerFrontend

        return SpyServerFrontend(
            cfg.get("spyserverHost"), int(cfg.get("spyserverPort"))
        )
    if device_type in ("airspy", "rtlsdr", "hackrf", "sdrplay"):
        raise NotImplementedError(
            f"'{device_type}' is a host-USB frontend outside TPU scope; "
            "use 'cfile' for recorded captures or 'spyserver' for network "
            "IQ (FrontendDevice interface kept for pluggability)"
        )
    raise ValueError(f"unknown deviceType '{device_type}'")
