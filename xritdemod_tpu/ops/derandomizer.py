"""CCSDS additive pseudo-noise (de)randomizer.

TPU-native replacement for SatHelper `DeRandomizer::DeRandomize` as called at
/root/reference/decoder/src/newdecoder.cpp:307 on the 1020 post-sync bytes of
every frame.  The PN sequence (CCSDS 131.0-B, polynomial
x^8 + x^7 + x^5 + x^3 + 1, all-ones seed, restarted each frame) is a fixed
byte vector, so derandomization is one XOR — precompute the vector host-side
and broadcast-XOR on device.  Randomize == derandomize (XOR involution), so
the same vector builds test fixtures.

LFSR convention locked against the canonical sequence prefix
FF 48 0E C0 9A 0D 70 BC: 8-bit Fibonacci register seeded 0xFF, output is the
MSB, shift left, feedback bit = XOR of state bits {7, 4, 2, 0} into the LSB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pn_sequence", "derandomize", "randomize"]

_TAPS = (7, 4, 2, 0)


@functools.lru_cache(maxsize=None)
def _pn_np(nbytes: int) -> np.ndarray:
    state = 0xFF
    out = np.empty(nbytes, np.uint8)
    for i in range(nbytes):
        v = 0
        for _ in range(8):
            v = (v << 1) | ((state >> 7) & 1)
            fb = 0
            for t in _TAPS:
                fb ^= (state >> t) & 1
            state = ((state << 1) | fb) & 0xFF
        out[i] = v
    return out


def pn_sequence(nbytes: int) -> jnp.ndarray:
    """First `nbytes` of the CCSDS PN sequence as uint8 (device array)."""
    return jnp.asarray(_pn_np(nbytes))


def derandomize(data: jax.Array) -> jax.Array:
    """XOR `(..., N)` uint8 frames with the PN sequence (restart per frame)."""
    return jnp.bitwise_xor(data, pn_sequence(data.shape[-1]))


randomize = derandomize  # XOR involution
