"""Frame-sync correlation against 64-bit coded-domain unique words.

TPU-native replacement for SatHelper `Correlator` as driven by the reference
decoder flywheel (/root/reference/decoder/src/newdecoder.cpp:218-247): the
reference hard-decides each soft byte and counts matching bits against each
registered unique word at each lag, serially.  Here the whole search is one
batched correlation: hard signs (+1 for bit 0 / non-negative symbol, -1 for
bit 1 / negative symbol) convolved against +-1 word templates via
`lax.conv_general_dilated`, which XLA tiles onto the MXU; the flywheel
collapses into an `argmax`.

Also hosts the BPSK 180-degree ambiguity fix (SatHelper
`PacketFixer::fixPacket`, newdecoder.cpp:268-270): for real BPSK soft
symbols a 180-degree rotation is a sign flip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu.utils.bits import bits_of_u64

__all__ = [
    "make_templates",
    "correlate",
    "best_correlation",
    "correlate_at",
    "phase_fix",
    "UW_BITS",
]

UW_BITS = 64


def make_templates(words: list[int]) -> jnp.ndarray:
    """64-bit unique words -> `(W, 64)` float32 +-1 templates.

    Bit 1 expects a negative soft symbol (template -1); bit 0 positive.
    """
    t = np.stack([1.0 - 2.0 * bits_of_u64(w).astype(np.float32) for w in words])
    return jnp.asarray(t, jnp.float32)


def _hard_signs(soft: jax.Array) -> jax.Array:
    """Soft symbols -> +-1 hard-decision signs (0 decides as bit 0 / +1)."""
    return jnp.where(soft < 0, -1.0, 1.0).astype(jnp.float32)


def correlate(soft: jax.Array, templates: jax.Array) -> jax.Array:
    """Count matching bits for every word at every lag.

    Args:
      soft: `(..., L)` soft symbols (any signed dtype; only signs are used).
      templates: `(W, 64)` +-1 word templates from `make_templates`.

    Returns:
      `(..., W, L-63)` float32 match counts in [0, 64].
    """
    lead = soft.shape[:-1]
    L = soft.shape[-1]
    s = _hard_signs(soft).reshape(-1, 1, L)          # (B, C=1, W)
    rhs = templates[:, None, :]                       # (O=W, I=1, K=64)
    dot = jax.lax.conv_general_dilated(
        s,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=jnp.float32,
    )                                                 # (B, W, P)
    counts = (UW_BITS + dot) * 0.5
    return counts.reshape(lead + counts.shape[1:])


def best_correlation(counts: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """`(..., W, P)` counts -> (corr, word, pos), each `(...)`.

    Matches the reference readout (newdecoder.cpp:239-241): the highest
    match count wins; ties resolve to the lowest word then lowest position.
    """
    W, P = counts.shape[-2], counts.shape[-1]
    flat = counts.reshape(counts.shape[:-2] + (W * P,))
    idx = jnp.argmax(flat, axis=-1)
    corr = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    return corr, (idx // P).astype(jnp.int32), (idx % P).astype(jnp.int32)


def correlate_at(
    soft: jax.Array, templates: jax.Array, positions: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Match counts at given start positions only (per-frame sync re-check).

    Args:
      soft: `(L,)` soft symbols.
      templates: `(W, 64)`.
      positions: `(B,)` int32 starts.

    Returns:
      `(corr, word)` each `(B,)`: best count over words at each position.
    """
    def one(p):
        win = jax.lax.dynamic_slice(soft, (p,), (UW_BITS,))
        dot = templates @ _hard_signs(win)
        return (UW_BITS + dot) * 0.5

    counts = jax.vmap(one)(positions)                 # (B, W)
    word = jnp.argmax(counts, axis=-1).astype(jnp.int32)
    corr = jnp.max(counts, axis=-1)
    return corr, word


def phase_fix(soft: jax.Array, word: jax.Array) -> jax.Array:
    """Resolve the BPSK 180-degree ambiguity: negate when word is odd.

    Registered word order follows the reference (UW0 then UW2,
    newdecoder.cpp:145-151): word 0 is the 0-degree pattern, word 1 the
    180-degree pattern.  `word` broadcasts against `soft`'s leading dims.
    """
    flip = (word % 2 == 1)
    sign = jnp.where(flip, -1, 1).astype(soft.dtype)
    return soft * sign
