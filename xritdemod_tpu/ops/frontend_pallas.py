"""Fused channels-last demod front-end: AGC + RRC FIR + Costas in ONE pass.

The three stages between the decimator and the clock recovery (reference
hot loops at /root/reference/demodulator/src/demodulator.cpp:143-152) are
each one HBM read + one HBM write when run as separate kernels, plus a
`(C, T)` <-> channels-last transpose pair per Pallas stage.  Fused, the
whole front-end is a single sequential-grid Pallas kernel over
channels-last `(T, G, 128)` planes (C = G*128, the same layout as
ops/stream_pallas.py — one per-sample update is a handful of full-width
VPU ops on a single (G, 128) vreg group, ~6x cheaper than flat (1, C)
rows):

  - per grid step a `(rows, G, 128)` tile streams through VMEM once;
  - the AGC per-sample gain recursion writes into a `(rows+N-1, G, 128)`
    window buffer whose first N-1 rows are the carried RRC history;
  - the RRC is G banded-tap matmuls `(rows, rows+N-1) @ (rows+N-1, 128)`
    on the MXU (same band matrix as ops/fir.fir_block_real_matmul,
    transposed for the channels-last layout);
  - the Costas per-sample PLL recursion consumes the FIR rows and writes
    the output tile.

Semantics per stage are identical to the standalone kernels
(ops/stream_pallas.py exact recursions; ops/fir.py matmul form): same
update formulas, same causal alignment (FIR history = previous N-1
input-after-AGC samples).  Loop state (gain, phase, freq) and the FIR
history persist across grid steps in VMEM scratch and are flushed to the
state outputs at the last step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xritdemod_tpu.ops.agc import AgcParams
from xritdemod_tpu.ops.costas import CostasParams, CostasState
from xritdemod_tpu.ops.fir import _band_matrix_np
from xritdemod_tpu.utils.cplx import CF32

__all__ = ["demod_frontend_pallas"]

_TWO_PI = 2.0 * np.pi


def _frontend_kernel(
    xr_ref, xi_ref, g0_ref, ph0_ref, fr0_ref, hr0_ref, hi0_ref, m2_ref,
    yr_ref, yi_ref, gout_ref, phout_ref, frout_ref, hrout_ref, hiout_ref,
    win_r, win_i, fir_r, fir_i, st_scr,
    *, rows, nh, G, agc: AgcParams, costas: CostasParams,
):
    rate = jnp.float32(agc.rate)
    ref = jnp.float32(agc.reference)
    max_gain = jnp.float32(agc.max_gain)
    alpha = jnp.float32(costas.alpha)
    beta = jnp.float32(costas.beta)
    fmin = jnp.float32(costas.freq_min)
    fmax = jnp.float32(costas.freq_max)
    two_pi = jnp.float32(_TWO_PI)

    @pl.when(pl.program_id(0) == 0)
    def _():
        st_scr[0] = g0_ref[:]
        st_scr[1] = ph0_ref[:]
        st_scr[2] = fr0_ref[:]
        win_r[0:nh] = hr0_ref[:]
        win_i[0:nh] = hi0_ref[:]

    # ---- AGC: sequential gain recursion into the window buffer ----------
    def agc_body(r, g):
        xr = xr_ref[r]                                    # (G, 128)
        xi = xi_ref[r]
        win_r[nh + r] = xr * g
        win_i[nh + r] = xi * g
        mag = jnp.sqrt(xr * xr + xi * xi)
        g = g + rate * (ref - mag * g)
        if agc.max_gain > 0:
            g = jnp.minimum(g, max_gain)
        return g

    g = jax.lax.fori_loop(0, rows, agc_body, st_scr[0])
    st_scr[0] = g

    # ---- RRC: banded-tap matmuls over the window (MXU, one per plane) ---
    m2 = m2_ref[:]                                        # (rows, rows+nh)
    for gi in range(G):
        fir_r[:, gi, :] = jax.lax.dot_general(
            m2, win_r[:, gi, :], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        fir_i[:, gi, :] = jax.lax.dot_general(
            m2, win_i[:, gi, :], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    # Next step's FIR history = last nh AGC rows.
    win_r[0:nh] = win_r[pl.ds(rows, nh)]
    win_i[0:nh] = win_i[pl.ds(rows, nh)]

    # ---- Costas: sequential PLL recursion over the FIR rows -------------
    def costas_body(r, carry):
        phase, freq = carry
        xr = fir_r[r]                                     # (G, 128)
        xi = fir_i[r]
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
        0, rows, costas_body, (st_scr[1], st_scr[2])
    )
    st_scr[1] = phase
    st_scr[2] = freq

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        gout_ref[:] = g
        phout_ref[:] = phase
        frout_ref[:] = freq
        hrout_ref[:] = win_r[0:nh]
        hiout_ref[:] = win_i[0:nh]


@functools.partial(
    jax.jit,
    static_argnames=("agc", "taps", "costas", "rows", "interpret"),
)
def demod_frontend_pallas(
    x: CF32,
    gain: jax.Array,
    rrc_hist: CF32,
    costas_state: CostasState,
    agc: AgcParams,
    taps: tuple,
    costas: CostasParams,
    rows: int = 256,
    interpret: bool = False,
) -> tuple[CF32, jax.Array, CF32, CostasState]:
    """AGC -> RRC -> Costas over a channels-last `(T, C)` block.

    Args:
      x: `(T, C)` CF32 block (channels-last); T % rows == 0, C % 128 == 0.
      gain: `(C,)` AGC gain state.
      rrc_hist: `(C, N-1)` CF32 FIR history (same layout as the `(C, T)`
        path's state).
      costas_state: `(C,)` phase/freq.
      taps: length-N tuple of RRC taps (static).

    Returns `(y, gain', rrc_hist', costas_state')` with `y` `(T, C)` CF32.
    """
    T, C = x.re.shape
    ntaps = len(taps)
    nh = ntaps - 1
    if C % 128 or T % rows:
        raise ValueError(f"need C%128==0 and T%{rows}==0, got {(T, C)}")
    G = C // 128
    m2 = jnp.asarray(_band_matrix_np(taps, rows).T)       # (rows, rows+nh)

    f32 = jnp.float32
    planes = lambda a: a.reshape(a.shape[0], G, 128)      # free: row-major
    blk = lambda: pl.BlockSpec((rows, G, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    yr, yi, gout, phout, frout, hrout, hiout = pl.pallas_call(
        functools.partial(
            _frontend_kernel, rows=rows, nh=nh, G=G, agc=agc, costas=costas
        ),
        grid=(T // rows,),
        out_shape=(
            jax.ShapeDtypeStruct((T, G, 128), f32),
            jax.ShapeDtypeStruct((T, G, 128), f32),
            jax.ShapeDtypeStruct((G, 128), f32),
            jax.ShapeDtypeStruct((G, 128), f32),
            jax.ShapeDtypeStruct((G, 128), f32),
            jax.ShapeDtypeStruct((nh, G, 128), f32),
            jax.ShapeDtypeStruct((nh, G, 128), f32),
        ),
        in_specs=[blk(), blk(), full(), full(), full(), full(), full(),
                  full()],
        out_specs=(blk(), blk(), full(), full(), full(), full(), full()),
        scratch_shapes=[
            pltpu.VMEM((rows + nh, G, 128), f32),
            pltpu.VMEM((rows + nh, G, 128), f32),
            pltpu.VMEM((rows, G, 128), f32),
            pltpu.VMEM((rows, G, 128), f32),
            pltpu.VMEM((3, G, 128), f32),
        ],
        interpret=interpret,
    )(
        planes(x.re), planes(x.im),
        gain.reshape(G, 128),
        costas_state.phase.reshape(G, 128),
        costas_state.freq.reshape(G, 128),
        planes(jnp.swapaxes(rrc_hist.re, 0, 1)),
        planes(jnp.swapaxes(rrc_hist.im, 0, 1)),
        m2,
    )
    return (
        CF32(yr.reshape(T, C), yi.reshape(T, C)),
        gout.reshape(C),
        CF32(
            jnp.swapaxes(hrout.reshape(nh, C), 0, 1),
            jnp.swapaxes(hiout.reshape(nh, C), 0, 1),
        ),
        CostasState(phase=phout.reshape(C), freq=frout.reshape(C)),
    )
