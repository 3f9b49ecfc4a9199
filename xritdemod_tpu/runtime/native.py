"""ctypes bindings for the native host-runtime core (native/xrit_io.cpp).

The reference's runtime is C++ (SatHelper); this loads our native
equivalents — SPSC ring buffer, sample normalization, symbol quantization,
TCP helpers — building the shared library with make/g++ on first use.
Everything has a pure-Python fallback (`available()` gates callers), so the
framework works without a toolchain; with it, the ingest/egress hot paths
run native like the reference's.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["load", "available", "NativeRing", "quantize_symbols_native"]

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libxrit_io.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    P = ctypes.POINTER
    lib.xrit_ring_create.restype = ctypes.c_void_p
    lib.xrit_ring_create.argtypes = [ctypes.c_size_t]
    lib.xrit_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.xrit_ring_size.restype = ctypes.c_size_t
    lib.xrit_ring_size.argtypes = [ctypes.c_void_p]
    lib.xrit_ring_capacity.restype = ctypes.c_size_t
    lib.xrit_ring_capacity.argtypes = [ctypes.c_void_p]
    lib.xrit_ring_overflows.restype = ctypes.c_uint64
    lib.xrit_ring_overflows.argtypes = [ctypes.c_void_p]
    lib.xrit_ring_close.argtypes = [ctypes.c_void_p]
    lib.xrit_ring_push.restype = ctypes.c_size_t
    lib.xrit_ring_push.argtypes = [
        ctypes.c_void_p, P(ctypes.c_float), ctypes.c_size_t, ctypes.c_int,
    ]
    lib.xrit_ring_pop.restype = ctypes.c_size_t
    lib.xrit_ring_pop.argtypes = [
        ctypes.c_void_p, P(ctypes.c_float), ctypes.c_size_t, ctypes.c_long,
    ]
    lib.xrit_quantize_symbols.argtypes = [
        P(ctypes.c_float), P(ctypes.c_int8), ctypes.c_size_t,
    ]
    lib.xrit_u8_to_f32.argtypes = [
        P(ctypes.c_uint8), P(ctypes.c_float), ctypes.c_size_t,
    ]
    lib.xrit_s16_to_f32.argtypes = [
        P(ctypes.c_int16), P(ctypes.c_float), ctypes.c_size_t,
    ]
    lib.xrit_deinterleave.argtypes = [
        P(ctypes.c_float), P(ctypes.c_float), P(ctypes.c_float), ctypes.c_size_t,
    ]
    lib.xrit_io_abi_version.restype = ctypes.c_int
    return lib


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            if lib.xrit_io_abi_version() != 1:
                return None
            _lib = _configure(lib)
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeRing:
    """SPSC float ring backed by the C++ implementation."""

    def __init__(self, capacity: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native xrit_io unavailable")
        self._lib = lib
        self._h = lib.xrit_ring_create(capacity)
        self.capacity = lib.xrit_ring_capacity(self._h)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.xrit_ring_destroy(h)
            self._h = None

    def push(self, data: np.ndarray, blocking: bool = False) -> int:
        data = np.ascontiguousarray(data, np.float32)
        return self._lib.xrit_ring_push(
            self._h, _fptr(data), len(data), 1 if blocking else 0
        )

    def pop(self, n: int, timeout_ms: int = -1) -> np.ndarray | None:
        out = np.empty(n, np.float32)
        got = self._lib.xrit_ring_pop(self._h, _fptr(out), n, timeout_ms)
        return out if got == n else None

    def size(self) -> int:
        return self._lib.xrit_ring_size(self._h)

    @property
    def overflows(self) -> int:
        return self._lib.xrit_ring_overflows(self._h)

    def close(self) -> None:
        self._lib.xrit_ring_close(self._h)


def quantize_symbols_native(soft: np.ndarray) -> np.ndarray:
    """float soft symbols -> int8 wire bytes via the native kernel."""
    lib = load()
    soft = np.ascontiguousarray(soft, np.float32)
    out = np.empty(len(soft), np.int8)
    lib.xrit_quantize_symbols(
        _fptr(soft), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(soft)
    )
    return out
