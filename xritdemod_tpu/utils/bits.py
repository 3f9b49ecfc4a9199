"""Bit/byte packing helpers (MSB-first, CCSDS convention)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["unpack_bits", "pack_bits", "bits_of_u64", "np_unpack_bits", "np_pack_bits"]


def unpack_bits(data: jax.Array) -> jax.Array:
    """`(..., N)` uint8 -> `(..., 8N)` uint8 bits, MSB first."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (data[..., None] >> shifts) & 1
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def pack_bits(bits: jax.Array) -> jax.Array:
    """`(..., 8N)` {0,1} -> `(..., N)` uint8, MSB first."""
    b = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 8, 8).astype(jnp.uint8)
    weights = (1 << jnp.arange(7, -1, -1, dtype=jnp.uint8)).astype(jnp.uint8)
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint8)


def bits_of_u64(word: int, nbits: int = 64) -> np.ndarray:
    """Python int -> MSB-first bit vector (host side)."""
    return np.array([(word >> (nbits - 1 - i)) & 1 for i in range(nbits)], np.uint8)


def np_unpack_bits(data: np.ndarray) -> np.ndarray:
    return np.unpackbits(np.asarray(data, np.uint8), axis=-1)


def np_pack_bits(bits: np.ndarray) -> np.ndarray:
    return np.packbits(np.asarray(bits, np.uint8), axis=-1)
