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
    *scratch,
    rows, nh, G, agc: AgcParams, costas: CostasParams, block_k=0,
    block_stages="both", sub=128, precision="highest", fir_inplace=False,
):
    if fir_inplace:
        # The FIR output is stored IN-PLACE in the window buffer: strip s0
        # reads AGC rows [s0, s0+sub+nh) and then overwrites rows
        # [s0, s0+sub) — regions later strips read ([s0+sub, ...)) are
        # untouched, and the next-step history rows [rows, rows+nh) stay
        # AGC output.  Saves a whole (rows, G, 128) x2 scratch — the VMEM
        # margin that unlocks C=4096 (G=32); costs ~3% at smaller G from
        # the tighter write ordering, so it's only on when needed.
        win_r, win_i, st_scr = scratch
        fir_r, fir_i = win_r, win_i
    else:
        win_r, win_i, fir_r, fir_i, st_scr = scratch
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
    if block_k and block_stages in ("both", "agc"):
        # K-row slab form: the gain recurrence g' = (1 - rate*|x|)*g +
        # rate*ref is linear given the INPUT magnitudes, so the K applied
        # gains come from an exact affine prefix tree (log2 K shifted
        # composes, all full-slab VPU ops).  The max-gain clamp is EXACT
        # too: min(a*g+b, M) is monotone in g, so the clamped state is
        # min(free trajectory, min_k restart-from-M trajectories) — an
        # in-slab running min over (M - b_k)/a_k (no logs needed: a stays
        # ~1 over K=8 rows), chained exactly across slabs through the
        # clamped carried gain.  Same math as ops/agc.agc_block.
        # Sequential length drops rows -> rows/K.
        # NOTE: the slab loop is a STATIC Python unroll (rows//bk bodies)
        # with static slices throughout — dynamic-offset multi-row pl.ds
        # access inside fori_loop sends the Mosaic compiler into a
        # pathological 25-minute-plus lowering (single-row dynamic access,
        # as in the exact branch below, is fine).
        bk = block_k
        g = st_scr[0]
        for si in range(rows // bk):
            r0 = si * bk
            xr = xr_ref[r0 : r0 + bk]                     # (bk, G, 128)
            xi = xi_ref[r0 : r0 + bk]
            mag = jnp.sqrt(xr * xr + xi * xi)
            a = 1.0 - rate * mag
            b = jnp.full_like(a, rate * ref)
            s = 1
            while s < bk:
                a_sh = jnp.concatenate(
                    [jnp.ones((s, G, 128), jnp.float32), a[:-s]], axis=0
                )
                b_sh = jnp.concatenate(
                    [jnp.zeros((s, G, 128), jnp.float32), b[:-s]], axis=0
                )
                b = a * b_sh + b
                a = a * a_sh
                s *= 2
            if agc.max_gain > 0:
                q = (max_gain - b) / a
                cm = q
                s = 1
                while s < bk:
                    pad = jnp.full((s, G, 128), jnp.inf, jnp.float32)
                    cm = jnp.minimum(
                        cm, jnp.concatenate([pad, cm[:-s]], axis=0)
                    )
                    s *= 2
                g_next = jnp.minimum(
                    a * jnp.minimum(g[None], cm) + b, max_gain
                )
            else:
                g_next = a * g[None] + b                  # g after row k
            g_app = jnp.concatenate([g[None], g_next[:-1]], axis=0)
            win_r[nh + r0 : nh + r0 + bk] = xr * g_app
            win_i[nh + r0 : nh + r0 + bk] = xi * g_app
            # (integer indexing lowers to dynamic_slice, which Mosaic
            # rejects on values — use a static slice + reshape)
            g = jax.lax.slice_in_dim(g_next, bk - 1, bk, axis=0).reshape(
                G, 128
            )
    else:
        def agc_body(r, g):
            xr = xr_ref[r]                                # (G, 128)
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

    # ---- RRC: banded-tap matmuls over the window (MXU, per plane) -------
    # Sub-tiled: the band matrix only has `ntaps` nonzero diagonals, so a
    # (rows, rows+nh) dense matmul wastes MXU passes ~rows/ntaps-fold.
    # Tiling the output rows into `sub`-row strips keeps the operand at
    # (sub, sub+nh) — 40% less MXU work at rows=256/sub=128 — and is
    # bit-identical (the extra zeros drop out of the K-accumulation).
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
        "bf16": jax.lax.Precision.DEFAULT,
    }[precision]
    m2 = m2_ref[:]                                        # (sub, sub+nh)
    if precision == "bf16":
        m2 = m2.astype(jnp.bfloat16)
    for gi in range(G):
        for s0 in range(0, rows, sub):
            wr = win_r[s0 : s0 + sub + nh, gi, :]
            wi = win_i[s0 : s0 + sub + nh, gi, :]
            if precision == "bf16":
                wr = wr.astype(jnp.bfloat16)
                wi = wi.astype(jnp.bfloat16)
            fir_r[s0 : s0 + sub, gi, :] = jax.lax.dot_general(
                m2, wr, (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
            fir_i[s0 : s0 + sub, gi, :] = jax.lax.dot_general(
                m2, wi, (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )
    # ---- Costas: sequential PLL recursion over the FIR rows -------------
    if block_k and block_stages in ("both", "costas"):
        # Frozen-ramp K-row slab update (ops/costas.costas_block_update
        # semantics fused on-chip): rotate slab row k by phase + k*freq,
        # then advance the loop filter once with the exact K-step
        # composition weights w_k = alpha + beta*(K-k).
        bk = block_k
        kcol = jax.lax.broadcasted_iota(jnp.int32, (bk, G, 128), 0).astype(
            jnp.float32
        )
        wcol = alpha + beta * (jnp.float32(bk) - kcol)
        advance = bk * max(abs(costas.freq_min), abs(costas.freq_max)) + (
            bk * (costas.alpha + costas.beta * bk)
        )
        nwrap = int(np.ceil(advance / _TWO_PI)) + 1

        def costas_slab(r0, carry):
            # r0 static (see AGC note: static unroll, static slices).
            phase, freq = carry                           # (G, 128)
            xr = fir_r[r0 : r0 + bk]                      # (bk, G, 128)
            xi = fir_i[r0 : r0 + bk]
            ph = phase[None] + kcol * freq[None]
            c = jnp.cos(ph)
            s = jnp.sin(ph)
            yr = xr * c + xi * s
            yi = xi * c - xr * s
            yr_ref[r0 : r0 + bk] = yr
            yi_ref[r0 : r0 + bk] = yi
            err = jnp.clip(yr * yi, -1.0, 1.0)
            freq_new = jnp.clip(
                freq + beta * jnp.sum(err, axis=0), fmin, fmax
            )
            phase = (
                phase
                + jnp.float32(bk) * freq
                + jnp.sum(wcol * err, axis=0)
            )
            for _ in range(nwrap):
                phase = phase - jnp.where(phase > two_pi, two_pi, 0.0)
                phase = phase + jnp.where(phase < -two_pi, two_pi, 0.0)
            return phase, freq_new

        carry = (st_scr[1], st_scr[2])
        for si in range(rows // bk):
            carry = costas_slab(si * bk, carry)
        phase, freq = carry
    else:
        def costas_body(r, carry):
            phase, freq = carry
            xr = fir_r[r]                                 # (G, 128)
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

    # Next step's FIR history = last nh AGC rows (must come AFTER the
    # Costas pass: the FIR output aliases win rows [0, rows), which this
    # write would clobber at [0, nh)).
    win_r[0:nh] = win_r[pl.ds(rows, nh)]
    win_i[0:nh] = win_i[pl.ds(rows, nh)]

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        gout_ref[:] = g
        phout_ref[:] = phase
        frout_ref[:] = freq
        hrout_ref[:] = win_r[0:nh]
        hiout_ref[:] = win_i[0:nh]


@functools.partial(
    jax.jit,
    static_argnames=("agc", "taps", "costas", "rows", "interpret",
                     "block_k", "block_stages", "precision", "fir_inplace"),
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
    block_k: int = 0,
    block_stages: str = "both",
    precision: str = "highest",
    fir_inplace: bool | None = None,
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

    `block_k=K > 0` switches the AGC and Costas recursions to K-row slab
    forms (see _frontend_kernel): AGC gains via an exact affine prefix
    tree, Costas via the frozen-ramp block update of
    `ops.costas.costas_block_update` — ~K x fewer sequential steps.
    """
    T, C = x.re.shape
    ntaps = len(taps)
    nh = ntaps - 1
    if C % 128 or T % rows:
        raise ValueError(f"need C%128==0 and T%{rows}==0, got {(T, C)}")
    if block_k and rows % block_k:
        raise ValueError(f"rows {rows} not a multiple of block_k {block_k}")
    G = C // 128
    sub = min(rows, 128)                                  # RRC matmul strip
    m2 = jnp.asarray(_band_matrix_np(taps, sub).T)        # (sub, sub+nh)
    # Dedicated FIR scratch while it fits the 16 MB scoped-VMEM budget;
    # in-place (aliased into the window buffer) at G >= 32 where the extra
    # (rows, G, 128) x2 would overflow it.
    if fir_inplace is None:
        fir_inplace = G >= 32

    f32 = jnp.float32
    planes = lambda a: a.reshape(a.shape[0], G, 128)      # free: row-major
    blk = lambda: pl.BlockSpec((rows, G, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    yr, yi, gout, phout, frout, hrout, hiout = pl.pallas_call(
        functools.partial(
            _frontend_kernel, rows=rows, nh=nh, G=G, agc=agc, costas=costas,
            block_k=block_k, block_stages=block_stages, sub=sub,
            precision=precision, fir_inplace=fir_inplace,
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
        scratch_shapes=(
            [
                pltpu.VMEM((rows + nh, G, 128), f32),
                pltpu.VMEM((rows + nh, G, 128), f32),
            ]
            + (
                []
                if fir_inplace
                else [
                    pltpu.VMEM((rows, G, 128), f32),
                    pltpu.VMEM((rows, G, 128), f32),
                ]
            )
            + [pltpu.VMEM((3, G, 128), f32)]
        ),
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
