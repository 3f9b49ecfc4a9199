"""Pallas TPU kernels for the per-sample feedback stages (AGC, Costas).

Both stages are strictly sequential per-sample recursions over time
(reference hot loops: SatHelper `AGC::Work` and `CostasLoop::Work` as
driven at /root/reference/demodulator/src/demodulator.cpp:143,152).  The
XLA forms (ops/agc.py associative scan, ops/costas.py lax.scan) are
correct but stage intermediates through HBM many times; on TPU they cost
~60 ms each per (512, 131072) block.  Here each block is read from HBM
once and written once:

  - channels live as `(G, 128)` sublane x lane planes (C = G*128), so one
    per-sample update is a handful of full-width VPU ops;
  - time is the sequential axis: a 1D grid over row-blocks of a
    channels-last `(T, G, 128)` array (Pallas pipelines the HBM <-> VMEM
    block copies automatically across sequential grid steps), with an
    inner `fori_loop` over rows inside each block;
  - loop state (gain / phase+freq) persists across grid steps in VMEM
    scratch: written from the state inputs at step 0, flushed to the
    state outputs at the last step.

Semantics are the *exact* sequential recursions — for AGC this is
stronger than the XLA path, whose max-gain clamp is approximate while the
clamp binds mid-block (ops/agc.py docstring).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xritdemod_tpu.ops.agc import AgcParams
from xritdemod_tpu.ops.costas import CostasParams, CostasState
from xritdemod_tpu.utils.cplx import CF32

__all__ = ["agc_block_pallas", "costas_block_pallas"]

_TWO_PI = 2.0 * math.pi


def _to_planes(a: jax.Array) -> jax.Array:
    """(C, T) -> (T, G, 128) channels-last sublane/lane planes."""
    C, T = a.shape
    return a.T.reshape(T, C // 128, 128)


def _from_planes(a: jax.Array) -> jax.Array:
    """(T, G, 128) -> (C, T)."""
    T, G, L = a.shape
    return a.reshape(T, G * L).T


def _agc_kernel(xr_ref, xi_ref, g0_ref, yr_ref, yi_ref, gout_ref, g_scr,
                *, rows, params: AgcParams):
    rate = jnp.float32(params.rate)
    ref = jnp.float32(params.reference)
    max_gain = jnp.float32(params.max_gain)

    @pl.when(pl.program_id(0) == 0)
    def _():
        g_scr[:] = g0_ref[:]

    def body(r, g):
        xr = xr_ref[r]
        xi = xi_ref[r]
        yr_ref[r] = xr * g
        yi_ref[r] = xi * g
        mag = jnp.sqrt(xr * xr + xi * xi)
        g = g + rate * (ref - mag * g)
        if params.max_gain > 0:
            g = jnp.minimum(g, max_gain)
        return g

    g = jax.lax.fori_loop(0, rows, body, g_scr[:])
    g_scr[:] = g

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        gout_ref[:] = g


def _costas_kernel(xr_ref, xi_ref, ph0_ref, fr0_ref, yr_ref, yi_ref,
                   ph_out, fr_out, st_scr, *, rows, params: CostasParams):
    alpha = jnp.float32(params.alpha)
    beta = jnp.float32(params.beta)
    fmin = jnp.float32(params.freq_min)
    fmax = jnp.float32(params.freq_max)
    two_pi = jnp.float32(_TWO_PI)

    @pl.when(pl.program_id(0) == 0)
    def _():
        st_scr[0] = ph0_ref[:]
        st_scr[1] = fr0_ref[:]

    def body(r, carry):
        phase, freq = carry
        xr = xr_ref[r]
        xi = xi_ref[r]
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        yr = xr * c + xi * s
        yi = xi * c - xr * s
        yr_ref[r] = yr
        yi_ref[r] = yi
        err = jnp.clip(yr * yi, -1.0, 1.0)
        freq = jnp.clip(freq + beta * err, fmin, fmax)
        phase = phase + freq + alpha * err
        phase = phase - jnp.where(phase > two_pi, two_pi, 0.0)
        phase = phase + jnp.where(phase < -two_pi, two_pi, 0.0)
        return phase, freq

    phase, freq = jax.lax.fori_loop(
        0, rows, body, (st_scr[0], st_scr[1])
    )
    st_scr[0] = phase
    st_scr[1] = freq

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        ph_out[:] = phase
        fr_out[:] = freq


def _plane_specs(rows, G):
    blk = lambda: pl.BlockSpec((rows, G, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    st = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return blk, st


@functools.partial(
    jax.jit, static_argnames=("params", "rows", "interpret")
)
def agc_block_pallas(
    x: CF32, gain: jax.Array, params: AgcParams,
    rows: int = 256, interpret: bool = False,
) -> tuple[CF32, jax.Array]:
    """Exact sequential AGC over a `(C, T)` block; C % 128 == 0,
    T % rows == 0.  Drop-in for `agc.agc_block` (stronger: exact clamp)."""
    C, T = x.re.shape
    if C % 128 or T % rows:
        raise ValueError(f"need C%128==0 and T%{rows}==0, got {(C, T)}")
    G = C // 128
    xr = _to_planes(x.re)
    xi = _to_planes(x.im)
    g0 = gain.reshape(G, 128)
    blk, st = _plane_specs(rows, G)
    yr, yi, gout = pl.pallas_call(
        functools.partial(_agc_kernel, rows=rows, params=params),
        grid=(T // rows,),
        out_shape=(
            jax.ShapeDtypeStruct((T, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 128), jnp.float32),
        ),
        in_specs=[blk(), blk(), st()],
        out_specs=(blk(), blk(), st()),
        scratch_shapes=[pltpu.VMEM((G, 128), jnp.float32)],
        interpret=interpret,
    )(xr, xi, g0)
    return CF32(_from_planes(yr), _from_planes(yi)), gout.reshape(C)


@functools.partial(
    jax.jit, static_argnames=("params", "rows", "interpret")
)
def costas_block_pallas(
    x: CF32, state: CostasState, params: CostasParams,
    rows: int = 256, interpret: bool = False,
) -> tuple[CF32, CostasState]:
    """Exact sequential Costas loop over a `(C, T)` block; C % 128 == 0,
    T % rows == 0.  Drop-in for `costas.costas_block`."""
    C, T = x.re.shape
    if C % 128 or T % rows:
        raise ValueError(f"need C%128==0 and T%{rows}==0, got {(C, T)}")
    G = C // 128
    xr = _to_planes(x.re)
    xi = _to_planes(x.im)
    ph0 = state.phase.reshape(G, 128)
    fr0 = state.freq.reshape(G, 128)
    blk, st = _plane_specs(rows, G)
    st2 = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    yr, yi, ph, fr = pl.pallas_call(
        functools.partial(_costas_kernel, rows=rows, params=params),
        grid=(T // rows,),
        out_shape=(
            jax.ShapeDtypeStruct((T, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 128), jnp.float32),
        ),
        in_specs=[blk(), blk(), st2(), st2()],
        out_specs=(blk(), blk(), st2(), st2()),
        scratch_shapes=[pltpu.VMEM((2, G, 128), jnp.float32)],
        interpret=interpret,
    )(xr, xi, ph0, fr0)
    return (
        CF32(_from_planes(yr), _from_planes(yi)),
        CostasState(phase=ph.reshape(C), freq=fr.reshape(C)),
    )
