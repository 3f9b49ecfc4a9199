"""Stateful block FIR filtering (decimating polyphase) for complex streams.

TPU-native replacement for SatHelper `FirFilter::Work` as orchestrated at
/root/reference/demodulator/src/demodulator.cpp:136-150.  The reference
filters per-call with internal tap history; here a fixed-size block plus an
explicit `(..., ntaps-1)` history carry makes the op pure and shardable
(overlap-save halo = the history).

Complex data is the CF32 real-pair (see utils/cplx.py — the TPU has no
complex dtype); taps are real, so the filter is two real convolutions
expressed with `lax.conv_general_dilated` so XLA tiles onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu.utils.cplx import CF32

__all__ = ["fir_init", "fir_block", "fir_block_real", "fir_block_real_matmul"]


def fir_init(ntaps: int, leading_shape: tuple = ()) -> CF32:
    """Zero history carry for a FIR with `ntaps` taps."""
    shape = leading_shape + (max(ntaps - 1, 0),)
    return CF32(jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))


def _real_conv(x: jax.Array, taps: jax.Array, stride: int) -> jax.Array:
    """Cross-correlation y[b, n] = sum_k x[b, n*stride + k] * taps[k]."""
    lhs = x[:, None, :]                      # (B, C=1, W)
    rhs = taps[None, None, :]                # (O=1, I=1, K)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=jnp.float32,
    )
    return out[:, 0, :]


def fir_block_real(
    x: jax.Array, taps: jax.Array, history: jax.Array, decimation: int = 1
) -> tuple[jax.Array, jax.Array]:
    """Real-valued variant: `(..., T)` float32 in, carried `(..., N-1)` tail."""
    ntaps = taps.shape[0]
    xe = jnp.concatenate([history, x], axis=-1)
    lead, w = xe.shape[:-1], xe.shape[-1]
    out = _real_conv(xe.reshape(-1, w), taps.astype(jnp.float32), decimation)
    y = out.reshape(lead + (out.shape[-1],))
    new_history = xe[..., -(ntaps - 1):] if ntaps > 1 else history
    return y, new_history


@functools.lru_cache(maxsize=8)
def _band_matrix_np(taps_key: tuple, block: int) -> np.ndarray:
    """(L+N-1, L) banded tap matrix: M[j, n] = taps[j-n] for 0 <= j-n < N.

    Cached as numpy (never cache jnp in an lru_cache that may first fire
    inside a trace — tracer-leak bug class)."""
    taps = np.asarray(taps_key, np.float32)
    N = taps.shape[0]
    M = np.zeros((block + N - 1, block), np.float32)
    for n in range(block):
        M[n : n + N, n] = taps
    return M


def fir_block_real_matmul(
    x: jax.Array, taps: jax.Array, history: jax.Array, block: int = 256
) -> tuple[jax.Array, jax.Array]:
    """MXU form of `fir_block_real` (decimation 1): overlapping length-
    `block` windows times a banded tap matrix, one big f32 matmul instead
    of a lane-wise convolution (~6x on TPU at the RRC operating point).

    Equals the conv form to float reduction order.  `T % block == 0`.
    """
    ntaps = int(taps.shape[0])
    T = x.shape[-1]
    if T % block:
        raise ValueError(f"T={T} not a multiple of block={block}")
    B = T // block
    xe = jnp.concatenate([history, x], axis=-1)          # (..., T+N-1)
    lead = xe.shape[:-1]
    xe0 = xe[..., :T].reshape(lead + (B, block))
    # halo columns: first N-1 samples of the *next* block (real data for
    # every b — xe extends exactly N-1 past the last block).
    halo_flat = xe[..., block:]
    pad = B * block - halo_flat.shape[-1]
    halo = jnp.pad(
        halo_flat, [(0, 0)] * len(lead) + [(0, pad)]
    ).reshape(lead + (B, block))[..., :, : ntaps - 1]
    X = jnp.concatenate([xe0, halo], axis=-1)            # (..., B, L+N-1)
    M = jnp.asarray(_band_matrix_np(tuple(np.asarray(taps).tolist()), block))
    y = jax.lax.dot_general(
        X, M, (((X.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    y = y.reshape(lead + (T,))
    new_history = xe[..., -(ntaps - 1):] if ntaps > 1 else history
    return y, new_history


def fir_block(
    x: CF32,
    taps: jax.Array,
    history: CF32,
    decimation: int = 1,
    method: str = "conv",
) -> tuple[CF32, CF32]:
    """Filter one complex block with carried tap history.

    Args:
      x: `(..., T)` CF32 input block; `T % decimation == 0`.
      taps: `(N,)` float32 taps.
      history: `(..., N-1)` CF32 previous block tail.
      decimation: keep every `decimation`-th output.

    Returns:
      `(y, new_history)`; `y[..., n] = sum_k taps[k] * xe[..., n*D + k]` for
      `xe = [history, x]` (causal, group delay (N-1)/2 samples).
    """
    if method == "matmul":
        if decimation != 1:
            raise ValueError("matmul FIR path requires decimation == 1")
        yr, hr = fir_block_real_matmul(x.re, taps, history.re)
        yi, hi = fir_block_real_matmul(x.im, taps, history.im)
    else:
        yr, hr = fir_block_real(x.re, taps, history.re, decimation)
        yi, hi = fir_block_real(x.im, taps, history.im, decimation)
    return CF32(yr, yi), CF32(hr, hi)
