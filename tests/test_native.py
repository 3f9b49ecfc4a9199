"""Native host-runtime core: build, ring buffer semantics, kernels."""

import threading
import time

import numpy as np
import pytest

from xritdemod_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


class TestNativeRing:
    def test_push_pop_roundtrip(self):
        r = native.NativeRing(1 << 12)
        data = np.arange(1000, dtype=np.float32)
        assert r.push(data) == 1000
        out = r.pop(1000, timeout_ms=1000)
        np.testing.assert_array_equal(out, data)

    def test_wraparound(self):
        r = native.NativeRing(256)   # rounds to pow2
        for _ in range(10):
            d = np.random.randn(200).astype(np.float32)
            assert r.push(d) == 200
            np.testing.assert_array_equal(r.pop(200, 1000), d)

    def test_drop_on_overflow_nonblocking(self):
        r = native.NativeRing(128)
        assert r.push(np.zeros(100, np.float32)) == 100
        assert r.push(np.zeros(100, np.float32)) == 0   # dropped
        assert r.overflows == 1

    def test_blocking_producer_consumer(self):
        r = native.NativeRing(256)
        got = []

        def consumer():
            for _ in range(8):
                got.append(r.pop(128, timeout_ms=2000))

        t = threading.Thread(target=consumer)
        t.start()
        for i in range(8):
            r.push(np.full(128, i, np.float32), blocking=True)
        t.join(timeout=5)
        assert len(got) == 8
        for i, g in enumerate(got):
            assert g is not None and g[0] == i

    def test_pop_timeout(self):
        r = native.NativeRing(64)
        t0 = time.monotonic()
        assert r.pop(10, timeout_ms=100) is None
        assert 0.05 < time.monotonic() - t0 < 2.0


class TestNativeKernels:
    def test_quantize_matches_reference_rule(self):
        soft = np.array([0.5, -0.5, 2.0, -2.0, 0.0, 0.999], np.float32)
        q = native.quantize_symbols_native(soft)
        np.testing.assert_array_equal(q, [63, -63, 127, -128, 0, 126])

    def test_u8_and_s16_normalization(self):
        lib = native.load()
        import ctypes

        u8 = np.array([0, 128, 255], np.uint8)
        out = np.empty(3, np.float32)
        lib.xrit_u8_to_f32(
            u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 3)
        np.testing.assert_allclose(out, [(0-128)/128, 0.0, 127/128])

        s16 = np.array([-32768, 0, 16384], np.int16)
        lib.xrit_s16_to_f32(
            s16.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 3)
        np.testing.assert_allclose(out, [-1.0, 0.0, 0.5])

    def test_deinterleave(self):
        lib = native.load()
        import ctypes

        iq = np.arange(8, dtype=np.float32)
        re = np.empty(4, np.float32)
        im = np.empty(4, np.float32)
        f = ctypes.POINTER(ctypes.c_float)
        lib.xrit_deinterleave(
            iq.ctypes.data_as(f), re.ctypes.data_as(f), im.ctypes.data_as(f), 4)
        np.testing.assert_array_equal(re, [0, 2, 4, 6])
        np.testing.assert_array_equal(im, [1, 3, 5, 7])
