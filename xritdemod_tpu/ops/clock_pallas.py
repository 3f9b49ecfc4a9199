"""Pallas TPU kernel for batched M&M clock recovery (the flagship kernel).

Same math as `clock_recovery.clock_recovery_block_batch` (GNU Radio
`clock_recovery_mm_cc` semantics — see ops/clock_recovery.py for the
recurrence and the reference citations), fused into a single Mosaic kernel:

  - XLA's lowering of the dense inner step materializes ~10 (S, C)
    intermediates per symbol through HBM (~20 us/symbol); here the whole
    tap-evaluate/accumulate/update step runs in registers over a
    VMEM-resident window.
  - Input windows stage through VMEM in *super-chunks*: every
    SUPER x CHUNK symbols, one DMA per channel pulls that channel's next
    ~2.2k samples, aligned to the channel's own clock position
    (per-channel clocks drift apart, so a shared window would need the
    whole drift envelope).  Within a super-chunk, every 64-symbol chunk
    window is a *static, 128-aligned* slice of the aligned buffer — the
    per-channel dynamic addressing that poisons the XLA path (serialized
    row gathers) never appears.
  - The symbol loop is Python-unrolled so every output store has a static
    index (Mosaic requires lane-dimension offsets provably 128-aligned);
    outputs accumulate as (symbols, channels) rows and are transposed once
    outside the kernel.
  - The input is zero-padded by one super-window so buffers never clip at
    the block end (padded samples are dead by the `ii < limit` mask).

STATUS: experimental, not on the default path. The same super-chunk
structure implemented in pure XLA (`clock_recovery_block_batch`) reached
~400 ms/block once the per-chunk row gathers were amortized, and Mosaic's
tiling rules make the remaining gap expensive to close here:

  - lane-dim (last dim) slice offsets must be statically provable
    multiples of 128 — hence the Python-unrolled symbol loop and the
    (symbols, channels) output layout;
  - DMA slice *shapes* must be tile-aligned: a single-row `(1, SW)` slice
    of a `(C, SW)` HBM array is rejected ("must be aligned to tiling
    (8)"), so per-channel window DMAs need either a flat 1-D layout with
    value-level reshapes or `(C, SW/128, 128)` 3-D staging with
    sublane-multiple window sizes (1024-sample granularity), which inflates
    the dense tap window ~2x.

Revisit with a (C/8, 8, SW) staging layout or an mm_block-style
multi-symbol step if the XLA path's ~6.5 us/symbol needs to shrink
further. Falls back to the lax implementation via `interpret=True`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xritdemod_tpu.ops.clock_recovery import (
    INTERP_TAPS,
    NTAIL,
    ClockRecoveryParams,
    ClockRecoveryState,
)
from xritdemod_tpu.utils.cplx import CF32

__all__ = ["clock_recovery_block_pallas"]

CHUNK = 64          # symbols per chunk (static window per chunk)
SUPER = 8           # chunks per super-chunk (DMA granularity)
_S = 512            # chunk window lanes (multiple of 128)
_PAD = 8


def _geometry(params: ClockRecoveryParams):
    om, lim, gm = params.omega, params.omega_relative_limit, params.gain_mu
    om_max = om * (1 + lim) + gm
    dmax = math.ceil(SUPER * CHUNK * (om * lim + gm)) + _PAD
    w0 = []
    for m in range(SUPER):
        lo = math.floor(m * CHUNK * om) - dmax
        start = max(0, (lo // 128) * 128)
        w0.append(start)
        # the 512-lane window must cover this chunk's worst-case span
        need = math.floor(m * CHUNK * om) + dmax + CHUNK * om_max + INTERP_TAPS
        assert start + _S >= need, (m, start, need)
    SW = w0[-1] + _S
    SW = -(-SW // 128) * 128
    return tuple(w0), SW


def _mm_kernel(
    # inputs
    xr_hbm, xi_hbm, mu_ref, om_ref, ii_ref, pr_ref, pi_ref, cr_ref, ci_ref,
    # outputs
    sr_hbm, si_hbm, vd_hbm, mu_o, om_o, ii_o, pr_o, pi_o, cr_o, ci_o,
    # scratch
    win_r, win_i, ob_r, ob_i, ob_v, base_vmem, base_smem, in_sem, out_sem,
    *, C, n_real, num_supers, w0_list, SW, params: ClockRecoveryParams,
):
    omega_mid = jnp.float32(params.omega)
    omega_lim = jnp.float32(params.omega * params.omega_relative_limit)
    gain_omega = jnp.float32(params.gain_omega)
    gain_mu = jnp.float32(params.gain_mu)
    limit = n_real - INTERP_TAPS
    cols = SUPER * CHUNK

    lane = jax.lax.broadcasted_iota(jnp.int32, (C, _S), 1)
    pi_c = jnp.float32(math.pi)

    def super_body(s, carry):
        (mu, om, ii, pr0, pr1, pr2, pi0, pi1, pi2,
         cr0, cr1, cr2, ci0, ci1, ci2) = carry
        base = ii  # (C,) i32; input is padded so no end-of-block clipping

        # Per-channel bases must be read as scalars for DMA addressing:
        # vector -> VMEM scratch -> SMEM copy -> scalar reads.
        base_vmem[:] = base
        cp = pltpu.make_async_copy(base_vmem, base_smem, in_sem)
        cp.start()
        cp.wait()

        def issue(c, _):
            b = base_smem[c]
            pltpu.make_async_copy(
                xr_hbm.at[c, pl.ds(b, SW)], win_r.at[c], in_sem
            ).start()
            pltpu.make_async_copy(
                xi_hbm.at[c, pl.ds(b, SW)], win_i.at[c], in_sem
            ).start()
            return 0

        jax.lax.fori_loop(0, C, issue, 0)

        def drain(c, _):
            b = base_smem[c]
            pltpu.make_async_copy(
                xr_hbm.at[c, pl.ds(b, SW)], win_r.at[c], in_sem
            ).wait()
            pltpu.make_async_copy(
                xi_hbm.at[c, pl.ds(b, SW)], win_i.at[c], in_sem
            ).wait()
            return 0

        jax.lax.fori_loop(0, C, drain, 0)

        state = (mu, om, ii, pr0, pr1, pr2, pi0, pi1, pi2,
                 cr0, cr1, cr2, ci0, ci1, ci2)
        for m in range(SUPER):
            w0 = w0_list[m]
            wr = win_r[:, w0 : w0 + _S]
            wi = win_i[:, w0 : w0 + _S]
            for j in range(CHUNK):
                (mu, om, ii, pr0, pr1, pr2, pi0, pi1, pi2,
                 cr0, cr1, cr2, ci0, ci1, ci2) = state
                valid = ii < limit
                il = jnp.clip(ii - base - w0, 0, _S - INTERP_TAPS)

                offs = lane - il[:, None]
                in_tap = (offs >= 0) & (offs < INTERP_TAPS)
                u = offs.astype(jnp.float32) - 3.0 - mu[:, None]
                wwin = 0.54 + 0.46 * jnp.cos(jnp.float32(math.pi / 4.0) * u)
                pu = pi_c * u
                sinc = jnp.where(u == 0.0, 1.0, jnp.sin(pu) / pu)
                t = jnp.where(in_tap, sinc * wwin, 0.0)
                t = t / jnp.sum(t, axis=1, keepdims=True)
                p0r = jnp.sum(wr * t, axis=1)
                p0i = jnp.sum(wi * t, axis=1)

                c0r = jnp.where(p0r > 0, 1.0, 0.0)
                c0i = jnp.where(p0i > 0, 1.0, 0.0)
                e = (
                    (p0r - pr2) * cr1
                    + (p0i - pi2) * ci1
                    - ((c0r - cr2) * pr1 + (c0i - ci2) * pi1)
                )
                e = jnp.clip(e, -1.0, 1.0)

                new_om = om + gain_omega * e
                new_om = omega_mid + jnp.clip(
                    new_om - omega_mid, -omega_lim, omega_lim
                )
                new_mu = mu + new_om + gain_mu * e
                adv = jnp.floor(new_mu)
                new_ii = jnp.maximum(ii + adv.astype(jnp.int32), 0)
                new_mu = new_mu - adv

                col = m * CHUNK + j   # static: loops are Python-unrolled
                ob_r[col, :] = jnp.where(valid, p0r, 0.0)
                ob_i[col, :] = jnp.where(valid, p0i, 0.0)
                ob_v[col, :] = jnp.where(valid, 1.0, 0.0)

                state = (
                    jnp.where(valid, new_mu, mu),
                    jnp.where(valid, new_om, om),
                    jnp.where(valid, new_ii, ii),
                    jnp.where(valid, p0r, pr0), jnp.where(valid, pr0, pr1),
                    jnp.where(valid, pr1, pr2),
                    jnp.where(valid, p0i, pi0), jnp.where(valid, pi0, pi1),
                    jnp.where(valid, pi1, pi2),
                    jnp.where(valid, c0r, cr0), jnp.where(valid, cr0, cr1),
                    jnp.where(valid, cr1, cr2),
                    jnp.where(valid, c0i, ci0), jnp.where(valid, ci0, ci1),
                    jnp.where(valid, ci1, ci2),
                )

        # Flush this super-chunk's symbols ((cols, C) rows).
        for ref, hbmref in ((ob_r, sr_hbm), (ob_i, si_hbm), (ob_v, vd_hbm)):
            cp = pltpu.make_async_copy(
                ref, hbmref.at[pl.ds(s * cols, cols), :], out_sem
            )
            cp.start()
            cp.wait()
        return state

    init = (
        mu_ref[:], om_ref[:], ii_ref[:],
        pr_ref[0, :], pr_ref[1, :], pr_ref[2, :],
        pi_ref[0, :], pi_ref[1, :], pi_ref[2, :],
        cr_ref[0, :], cr_ref[1, :], cr_ref[2, :],
        ci_ref[0, :], ci_ref[1, :], ci_ref[2, :],
    )
    (mu, om, ii, pr0, pr1, pr2, pi0, pi1, pi2,
     cr0, cr1, cr2, ci0, ci1, ci2) = jax.lax.fori_loop(
        0, num_supers, super_body, init
    )
    mu_o[:] = mu
    om_o[:] = om
    ii_o[:] = ii
    pr_o[0, :], pr_o[1, :], pr_o[2, :] = pr0, pr1, pr2
    pi_o[0, :], pi_o[1, :], pi_o[2, :] = pi0, pi1, pi2
    cr_o[0, :], cr_o[1, :], cr_o[2, :] = cr0, cr1, cr2
    ci_o[0, :], ci_o[1, :], ci_o[2, :] = ci0, ci1, ci2


@functools.partial(
    jax.jit, static_argnames=("params", "num_slots", "interpret")
)
def clock_recovery_block_pallas(
    x: CF32,
    state: ClockRecoveryState,
    params: ClockRecoveryParams,
    num_slots: int,
    interpret: bool = False,
) -> tuple[CF32, jax.Array, ClockRecoveryState]:
    """Pallas path of the batch M&M kernel: `(C, T)` in, `(C,)` state.

    Drop-in for `clock_recovery_block_batch` (same outputs/carry semantics).
    """
    C, T = x.re.shape
    w0_list, SW = _geometry(params)
    xr = jnp.concatenate([state.tail.re, x.re], axis=-1)
    xi = jnp.concatenate([state.tail.im, x.im], axis=-1)
    n_real = xr.shape[-1]
    # Pad so per-channel super windows never clip at the block end.
    pad = jnp.zeros((C, SW), jnp.float32)
    xr_p = jnp.concatenate([xr, pad], axis=-1)
    xi_p = jnp.concatenate([xi, pad], axis=-1)

    cols = SUPER * CHUNK
    num_supers = -(-num_slots // cols)
    out_len = num_supers * cols

    kernel = functools.partial(
        _mm_kernel,
        C=C,
        n_real=n_real,
        num_supers=num_supers,
        w0_list=w0_list,
        SW=SW,
        params=params,
    )
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((out_len, C), f32),   # sr (rows = symbols)
        jax.ShapeDtypeStruct((out_len, C), f32),   # si
        jax.ShapeDtypeStruct((out_len, C), f32),   # valid
        jax.ShapeDtypeStruct((C,), f32),           # mu
        jax.ShapeDtypeStruct((C,), f32),           # omega
        jax.ShapeDtypeStruct((C,), jnp.int32),     # ii
        jax.ShapeDtypeStruct((3, C), f32),         # p re
        jax.ShapeDtypeStruct((3, C), f32),         # p im
        jax.ShapeDtypeStruct((3, C), f32),         # c re
        jax.ShapeDtypeStruct((3, C), f32),         # c im
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[hbm, hbm] + [vmem] * 7,
        out_specs=(hbm, hbm, hbm) + (vmem,) * 7,
        scratch_shapes=[
            pltpu.VMEM((C, SW), f32),
            pltpu.VMEM((C, SW), f32),
            pltpu.VMEM((cols, C), f32),
            pltpu.VMEM((cols, C), f32),
            pltpu.VMEM((cols, C), f32),
            pltpu.VMEM((C,), jnp.int32),
            pltpu.SMEM((C,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        xr_p,
        xi_p,
        state.mu,
        state.omega,
        state.ii,
        jnp.swapaxes(state.p.re, 0, 1),
        jnp.swapaxes(state.p.im, 0, 1),
        jnp.swapaxes(state.c.re, 0, 1),
        jnp.swapaxes(state.c.im, 0, 1),
    )
    sr, si, vd, mu, om, ii, pr, pim, cre, cim = outs
    sr = sr.T[:, :num_slots]
    si = si.T[:, :num_slots]
    valid = vd.T[:, :num_slots] > 0.5
    new_state = ClockRecoveryState(
        mu=mu,
        omega=om,
        ii=ii - (n_real - NTAIL),
        p=CF32(jnp.swapaxes(pr, 0, 1), jnp.swapaxes(pim, 0, 1)),
        c=CF32(jnp.swapaxes(cre, 0, 1), jnp.swapaxes(cim, 0, 1)),
        tail=CF32(xr[:, -NTAIL:], xi[:, -NTAIL:]),
    )
    return CF32(sr, si), valid, new_state
