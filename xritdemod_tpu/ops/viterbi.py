"""Soft-decision Viterbi decoder for the CCSDS rate-1/2 K=7 code.

TPU-native replacement for SatHelper `Viterbi27` (over libcorrect) as called
at /root/reference/decoder/src/newdecoder.cpp:281: the reference runs a
serial add-compare-select over 8256 steps per frame on the CPU.  Here the
64-state ACS is fully vectorized — path metrics live as a `(B, 64)` float32
array, the two-predecessor gather is a static reshape (predecessors of next
state n are n>>1 and (n>>1)+32), and the time axis is a `lax.scan` batched
over B frames so the chip is filled by the frame batch, not the (inherently
sequential) trellis.  Traceback is a second reversed scan over the stored
per-step decisions.

Soft symbols: float32 (int8 wire values cast), negative = coded bit 1
(constants.py:94-106).  The corrected-bit count (`Viterbi27::GetBER`
equivalent, newdecoder.cpp:309) is the Hamming distance between the
hard-decided input and the re-encoded decoded bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu import constants as C
from xritdemod_tpu.ops import conv_code

__all__ = ["viterbi_decode", "reencode_bits", "corrected_bits"]

_NS = conv_code.NUM_STATES  # 64
# Plain numpy so importing this module never initializes the XLA backend
# (jax.distributed.initialize must come first in multi-host entrypoints).
_NEG = np.float32(-1e30)


@functools.lru_cache(maxsize=None)
def _tables():
    # Plain numpy: jit traces close over these as constants (never cache
    # device arrays created inside a trace — they would be tracers).
    return conv_code.branch_signs()


@functools.partial(jax.jit, static_argnames=("unroll",))
def viterbi_decode(soft: jax.Array, unroll: int = 8) -> tuple[jax.Array, jax.Array]:
    """Decode `(B, 2T)` soft symbols -> (`(B, T)` uint8 bits, `(B,)` errors).

    `errors` is the corrected-bit count (GetBER equivalent): Hamming distance
    between the received hard decisions and the re-encoded survivor path.
    """
    soft = soft.astype(jnp.float32)
    B, T2 = soft.shape
    T = T2 // 2
    g1_0, g2_0, g1_1, g2_1 = _tables()

    s0 = soft[:, 0::2]  # (B, T) first coded bit of each pair
    s1 = soft[:, 1::2]

    def fwd(pm, xs):
        a, b = xs                         # (B,), (B,)
        bm0 = a[:, None] * g1_0 + b[:, None] * g2_0   # (B, 64)
        bm1 = a[:, None] * g1_1 + b[:, None] * g2_1
        low = pm[:, : _NS // 2]
        high = pm[:, _NS // 2 :]
        cand0 = jnp.repeat(low, 2, axis=-1) + bm0      # pred n>>1
        cand1 = jnp.repeat(high, 2, axis=-1) + bm1     # pred (n>>1)+32
        dec = cand1 > cand0
        return jnp.where(dec, cand1, cand0), dec

    pm0 = jnp.zeros((B, _NS), jnp.float32)
    pm, decisions = jax.lax.scan(
        fwd, pm0, (s0.T, s1.T), unroll=unroll
    )  # decisions: (T, B, 64) bool

    # Traceback from the best final state.
    end_state = jnp.argmax(pm, axis=-1).astype(jnp.int32)  # (B,)

    def back(state, dec_t):
        bit = (state & 1).astype(jnp.uint8)
        took_high = jnp.take_along_axis(dec_t, state[:, None], axis=1)[:, 0]
        pred = (state >> 1) + jnp.where(took_high, _NS // 2, 0).astype(jnp.int32)
        return pred, bit

    _, bits_rev = jax.lax.scan(
        back, end_state, decisions, reverse=True, unroll=unroll
    )
    bits = bits_rev.T  # scan with reverse=True stacks in forward order

    hard = (soft < 0).astype(jnp.uint8)        # received coded bits
    errors = corrected_bits(bits, hard)
    return bits, errors


def reencode_bits(bits: jax.Array) -> jax.Array:
    """Re-encode `(B, T)` decoded bits -> `(B, 2T)` coded bits (sr0 = 0)."""
    B, T = bits.shape
    b = bits.astype(jnp.uint8)
    pad = jnp.zeros((B, C.CONV_K - 1), jnp.uint8)
    ext = jnp.concatenate([pad, b], axis=-1)
    # Window w[t, k] = input bit t-6+k, k = 0..6; sr bit (6-k).
    win = jnp.stack([ext[:, k : k + T] for k in range(C.CONV_K)], axis=-1)
    pa = np.array(
        [(C.CONV_POLY_A >> (C.CONV_K - 1 - k)) & 1 for k in range(C.CONV_K)],
        np.uint8,
    )
    pb = np.array(
        [(C.CONV_POLY_B >> (C.CONV_K - 1 - k)) & 1 for k in range(C.CONV_K)],
        np.uint8,
    )
    c1 = (jnp.sum(win * pa, axis=-1) & 1) ^ 1
    c2 = (jnp.sum(win * pb, axis=-1) & 1) ^ 1
    out = jnp.stack([c1, c2], axis=-1).reshape(B, 2 * T)
    return out.astype(jnp.uint8)


def corrected_bits(bits: jax.Array, hard_received: jax.Array) -> jax.Array:
    """Hamming distance between re-encoded `bits` and received hard bits."""
    re = reencode_bits(bits)
    return jnp.sum(re != hard_received, axis=-1).astype(jnp.int32)
