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

__all__ = ["CostasParams", "costas_init", "costas_block", "costas_gains"]


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
