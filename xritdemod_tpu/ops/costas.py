"""Second-order BPSK Costas carrier-recovery loop.

Semantics follow GNU Radio `costas_loop_cc(loop_bw, order=2)` / SatHelper
`CostasLoop(alpha, 2)` as constructed at
/root/reference/demodulator/src/demodulator.cpp:448 (the golden-model
flowgraph demod_tcp_qt.py:265 uses the GR block directly):

    control loop gains from loop bandwidth Bn with damping zeta = sqrt(2)/2:
        denom = 1 + 2*zeta*Bn + Bn^2
        alpha = 4*zeta*Bn / denom          (phase gain)
        beta  = 4*Bn^2  / denom            (frequency gain)
    per sample:
        y[n]   = x[n] * exp(-i*phase)
        e      = clip(Re(y)*Im(y), +-1)    (BPSK detector, order 2)
        freq  += beta * e;  freq = clip(freq, +-1)
        phase += freq + alpha * e;  phase wrapped to +-2pi

The recursion is nonlinear (the detector sees the rotated sample), so this
op is a `lax.scan` with an unrolled body; throughput on TPU comes from
vmapping the scan over many channels (the scan body is elementwise over the
leading axis, so N channels advance in lockstep on the VPU).  A
block-parallel warm-start scheme for single-stream scaling lives in
`xritdemod_tpu.parallel`.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xritdemod_tpu.utils.cplx import CF32

__all__ = [
    "CostasParams",
    "costas_init",
    "costas_block",
    "costas_block_update",
    "costas_gains",
]


class CostasParams(NamedTuple):
    alpha: float   # phase gain
    beta: float    # frequency gain
    freq_min: float = -1.0
    freq_max: float = 1.0


def costas_gains(loop_bw: float) -> "CostasParams":
    """GR blocks::control_loop::update_gains with damping sqrt(2)/2."""
    damping = math.sqrt(2.0) / 2.0
    denom = 1.0 + 2.0 * damping * loop_bw + loop_bw * loop_bw
    return CostasParams(
        alpha=(4.0 * damping * loop_bw) / denom,
        beta=(4.0 * loop_bw * loop_bw) / denom,
    )


class CostasState(NamedTuple):
    phase: jax.Array   # (...,) float32
    freq: jax.Array    # (...,) float32


def costas_init(leading_shape: tuple = ()) -> CostasState:
    return CostasState(
        phase=jnp.zeros(leading_shape, jnp.float32),
        freq=jnp.zeros(leading_shape, jnp.float32),
    )


_TWO_PI = 2.0 * math.pi


def costas_block(
    x: CF32,
    state: CostasState,
    params: CostasParams,
    unroll: int = 32,
) -> tuple[CF32, CostasState]:
    """Run the Costas loop over a `(..., T)` CF32 block.

    Returns `(y, new_state)` with y the carrier-corrected samples.
    """
    alpha = jnp.float32(params.alpha)
    beta = jnp.float32(params.beta)

    def step(carry, xn):
        phase, freq = carry
        xr, xi = xn
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        # y = x * exp(-i*phase)
        yr = xr * c + xi * s
        yi = xi * c - xr * s
        err = jnp.clip(yr * yi, -1.0, 1.0)
        freq = jnp.clip(freq + beta * err, params.freq_min, params.freq_max)
        phase = phase + freq + alpha * err
        # GR phase_wrap: fmod-style wrap to (-2pi, 2pi)
        phase = phase - jnp.where(phase > _TWO_PI, _TWO_PI, 0.0)
        phase = phase + jnp.where(phase < -_TWO_PI, _TWO_PI, 0.0)
        return (phase, freq), (yr, yi)

    xt = (jnp.moveaxis(x.re, -1, 0), jnp.moveaxis(x.im, -1, 0))
    (phase, freq), (ytr, yti) = jax.lax.scan(
        step, (state.phase, state.freq), xt, unroll=unroll
    )
    y = CF32(jnp.moveaxis(ytr, 0, -1), jnp.moveaxis(yti, 0, -1))
    return y, CostasState(phase=phase, freq=freq)


def costas_block_update(
    x: CF32,
    state: CostasState,
    params: CostasParams,
    chunk: int = 8,
) -> tuple[CF32, CostasState]:
    """Frozen-ramp K-sample block update of the Costas loop.

    Same trick as the M&M block update (clock_recovery_block_update_batch):
    within a K=`chunk`-sample slab the NCO runs open loop — sample k is
    rotated by `phase + k*freq` — so the K rotations/detections vectorize,
    and the loop filter advances once per slab.  Given the frozen-ramp
    errors e_k the (phase, freq) update is the *exact* composition of K
    sequential GR `control_loop` steps (costas_block):

        freq'  = clip(freq + beta * sum_k e_k)
        phase' = phase + K*freq + sum_k (alpha + beta*(K-k)) * e_k

    (e_k enters freq at step k and phase through every later step's freq,
    hence the (K-k) weight; intermediate freq clips are deferred to the
    slab boundary).  The approximation vs the exact recursion is only that
    phase corrections apply at slab boundaries instead of per sample —
    a <= alpha*K*|e| ~ 0.1 rad transient worst case; post-FEC output is
    bit-identical on locked signals (tests/test_demod_chain.py).
    `chunk=1` reproduces `costas_block` exactly.  Sequential length drops
    T -> T/K.
    """
    alpha = jnp.float32(params.alpha)
    beta = jnp.float32(params.beta)
    K = chunk
    T = x.re.shape[-1]
    if T % K:
        raise ValueError(f"block length {T} not a multiple of chunk {K}")
    # Per-slab error weights for the composed phase update.
    kvec = jnp.arange(K, dtype=jnp.float32)
    wvec = alpha + beta * (jnp.float32(K) - kvec)
    # Enough conditional +-2pi wraps to cover the worst slab advance.
    advance = K * max(abs(params.freq_min), abs(params.freq_max)) + float(
        K * (params.alpha + params.beta * K)
    )
    nwrap = int(math.ceil(advance / _TWO_PI)) + 1

    def step(carry, xn):
        phase, freq = carry                      # (...,)
        xr, xi = xn                              # (K, ...)
        ph = phase[None] + kvec.reshape((K,) + (1,) * phase.ndim) * freq[None]
        c = jnp.cos(ph)
        s = jnp.sin(ph)
        yr = xr * c + xi * s
        yi = xi * c - xr * s
        err = jnp.clip(yr * yi, -1.0, 1.0)
        wk = wvec.reshape((K,) + (1,) * phase.ndim)
        freq_new = jnp.clip(
            freq + beta * jnp.sum(err, axis=0),
            params.freq_min, params.freq_max,
        )
        phase = phase + jnp.float32(K) * freq + jnp.sum(wk * err, axis=0)
        for _ in range(nwrap):
            phase = phase - jnp.where(phase > _TWO_PI, _TWO_PI, 0.0)
            phase = phase + jnp.where(phase < -_TWO_PI, _TWO_PI, 0.0)
        return (phase, freq_new), (yr, yi)

    xt = (
        jnp.moveaxis(x.re, -1, 0).reshape((T // K, K) + x.re.shape[:-1]),
        jnp.moveaxis(x.im, -1, 0).reshape((T // K, K) + x.re.shape[:-1]),
    )
    (phase, freq), (ytr, yti) = jax.lax.scan(
        step, (state.phase, state.freq), xt
    )
    ytr = ytr.reshape((T,) + x.re.shape[:-1])
    yti = yti.reshape((T,) + x.re.shape[:-1])
    y = CF32(jnp.moveaxis(ytr, 0, -1), jnp.moveaxis(yti, 0, -1))
    return y, CostasState(phase=phase, freq=freq)
