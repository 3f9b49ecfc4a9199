"""NRZ-M differential decoding over packed bytes (HRIT post-Viterbi step).

TPU-native replacement for SatHelper `DifferentialEncoding::nrzmDecode` as
called at /root/reference/decoder/src/newdecoder.cpp:283 on the decoded byte
stream.  NRZ-M encodes a 1 as a level change, so decode is
`bit[i] = enc[i] XOR enc[i-1]` — on packed MSB-first bytes this is one XOR
of the stream with itself shifted right by one bit, fully elementwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["nrzm_decode_bytes", "nrzm_encode_bytes"]


def nrzm_decode_bytes(data: jax.Array, prev_bit: jax.Array | int = 0) -> jax.Array:
    """Differential-decode `(..., N)` uint8 packed bits.

    `prev_bit` is the last encoded bit before the block (0 for the frame
    pipeline, where the first bytes are warm-up history anyway).
    """
    data = data.astype(jnp.uint8)
    # Bit preceding each bit: the byte shifted right 1 with the previous
    # byte's LSB entering the MSB.
    prev_lsb = jnp.roll(data, 1, axis=-1) & 1
    first = jnp.asarray(prev_bit, jnp.uint8)
    prev_lsb = prev_lsb.at[..., 0].set(first)
    shifted = (data >> 1) | (prev_lsb << 7)
    return jnp.bitwise_xor(data, shifted)


def nrzm_encode_bytes(data, prev_bit: int = 0):
    """Host-side inverse for fixtures: enc[i] = enc[i-1] XOR bit[i]."""
    import numpy as np

    bits = np.unpackbits(np.asarray(data, np.uint8), axis=-1)
    out = np.empty_like(bits)
    flat = bits.reshape(-1, bits.shape[-1])
    oflat = out.reshape(-1, bits.shape[-1])
    for r in range(flat.shape[0]):
        prev = prev_bit
        for i, b in enumerate(flat[r]):
            prev ^= int(b)
            oflat[r, i] = prev
    return np.packbits(out, axis=-1)
