"""Pallas TPU kernel for batched M&M clock recovery (the flagship kernel).

Exact GNU Radio `clock_recovery_mm_cc` semantics — the same per-symbol
recurrence, tap formula, and state carry as `clock_recovery.
clock_recovery_block_batch` (see that module for the recurrence and the
reference citations at /root/reference/demodulator/src/demodulator.cpp:449).

Why a kernel: the XLA form runs one dense (S, C) masked tap evaluation per
symbol inside a scan, and XLA stages the intermediates through HBM — the
clock stage measures ~280 ms/block at C=512 (9 us/symbol) while the pure
VPU cost of the math is ~1 us/symbol.  Here the whole super-chunk pipeline
runs on-chip:

  1. *Channels-last staging*: the input lives as `(T, C)` in HBM, so each
     super-chunk window is ONE shared-base DMA `(SWE, CT)` with a
     sublane-aligned dynamic offset — no per-channel gather, no row
     serialization.  (The previous attempt used per-channel `(1, SW)` DMAs
     from a `(C, T)` layout, which Mosaic rejects: slice shapes must be
     tile-aligned.)
  2. *In-VMEM barrel alignment*: each channel's clock position differs from
     the shared base by r_c <= spread (statically bounded — omega is
     hard-limited to +-0.5% and mu nudges to gain_mu); log2(spread) in-place
     shift+select stages align every channel's window to its own base.
  3. *Register-resident symbol loop*: per symbol, the dense masked 8-tap
     interpolation over the `(S8, CT)` window and the full M&M loop-filter
     update run unrolled in registers — sequential per-symbol updates cost
     nothing here, so no block-update approximation is needed.

Outputs are `(rows, C)` symbol planes DMA'd out per super-chunk and
transposed once outside.  Equals the XLA kernel to float reduction order
(same taps and trajectory; tree-sum order over the padded window differs).
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
    _spread_bound,
)
from xritdemod_tpu.utils.cplx import CF32

__all__ = [
    "clock_recovery_block_pallas_batch",
    "clock_recovery_block_pallas_batch_cl",
]

# MMSE table geometry (ops/interp_taps.py): 129 rows zero-padded to 256
# sublanes so the one-hot contraction dimension is tile-aligned.  A
# tighter 136-row (17 x 8) pad was measured MUCH slower (demod 2501 vs
# 3284 Msamp/s at C=2048): Mosaic's layouts want the power-of-two
# 256-sublane shape even though it doubles the compare rows.
_NSTEPS = 128
_TABPAD = 256


def _r8(v: int) -> int:
    return -(-v // 8) * 8


def _geometry(params: ClockRecoveryParams, chunk: int, superchunks: int,
              num_slots: int):
    om = params.omega
    lim = params.omega_relative_limit
    gm = params.gain_mu
    # Per-symbol advance floor(mu + omega + gain_mu*e) takes exactly two
    # values {a0, a0+1}: omega is hard-limited to om*(1 +- lim), |e| <= 1.
    a0 = math.floor(om * (1.0 - lim) - gm)
    assert om * (1.0 + lim) + gm + 1.0 < a0 + 2, "advance spans >2 values"
    dmax = math.ceil(superchunks * chunk * (om * lim + gm)) + 8
    w08 = []
    for m in range(superchunks):
        w = max(0, math.floor(m * chunk * om) - dmax)
        w08.append((w // 8) * 8)               # sublane-aligned chunk offsets
    # Chunk window: starts within RELMAX of w08[m], consumes at most
    # chunk*(a0+1) rows plus the 8 interpolator taps.
    RELMAX = _r8(2 * dmax + 16)
    CW = _r8(chunk * (a0 + 1) + INTERP_TAPS + 8)
    SL = RELMAX + CW
    SW8 = _r8(w08[-1] + SL)
    spread = _spread_bound(params, num_slots)
    SWE8 = _r8(SW8 + spread + 8)
    return tuple(w08), a0, RELMAX, CW, SL, SW8, spread, SWE8


def _mm_kernel(
    # inputs (refs)
    xr_hbm, xi_hbm, mu_ref, om_ref, ii_ref, pr_ref, pi_ref, cr_ref, ci_ref,
    tab_ref,
    # outputs
    sr_hbm, si_hbm, vd_hbm, mu_o, om_o, ii_o, pr_o, pi_o, cr_o, ci_o,
    # scratch
    win_r, win_i, ob_r, ob_i, ob_v, in_sem, out_sem,
    *, CT, num_supers, chunk, superchunks, w08, a0, RELMAX, CW, SL, SW8,
    spread, SWE8, limit, params: ClockRecoveryParams, block_update=False,
    interp_mode="sinc",
):
    omega_mid = jnp.float32(params.omega)
    omega_lim = jnp.float32(params.omega * params.omega_relative_limit)
    gain_omega = jnp.float32(params.gain_omega)
    gain_mu = jnp.float32(params.gain_mu)
    cols = superchunks * chunk
    tile = pl.program_id(0)
    col0 = pl.multiple_of(tile * CT, 128)

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (INTERP_TAPS, CT), 0)
    # Per-tap constants (computed once per grid step from iota — Pallas
    # kernels cannot close over array constants).
    _kf = k_iota.astype(jnp.float32)
    A_K = jnp.cos(jnp.float32(math.pi / 4.0) * (_kf - 3.0))  # (8, CT)
    B_K = jnp.sin(jnp.float32(math.pi / 4.0) * (_kf - 3.0))
    SGN_K = 1.0 - 2.0 * (_kf % 2.0)
    nb = max(1, (spread + 8).bit_length())
    nb2 = max(1, (RELMAX - 1).bit_length())
    pi_c = jnp.float32(math.pi)
    if interp_mode == "mmse":
        # Tabulated MMSE taps (GR mmse_fir_interpolator_cc structure, see
        # ops/interp_taps.py): the (8, 256) zero-padded transposed table
        # arrives as an input ref; a per-symbol row lookup is a one-hot
        # MXU contraction (single nonzero per output -> order-exact, and
        # no per-lane gather, which Mosaic would reject/serialize).
        tabv = tab_ref[:, :]                                  # (8, 256)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (_TABPAD, CT), 0)

        def _mmse_taps8(frac):
            """(1, CT) fractional mu -> (8, CT) tap rows (no normalize)."""
            imu = jnp.clip(
                jnp.floor(frac * jnp.float32(_NSTEPS) + 0.5).astype(
                    jnp.int32
                ),
                0,
                _NSTEPS,
            )
            oh = (row_iota == imu).astype(jnp.float32)        # (256, CT)
            return jax.lax.dot_general(
                tabv, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    def super_body(s, carry):
        (mu, om, ii, p1r, p2r, p3r, p1i, p2i, p3i,
         c1r, c2r, c3r, c1i, c2i, c3i) = carry          # each (CT,) f32/i32
        base = ii                                        # (1, CT) i32
        shared = jnp.min(base)
        sh8 = pl.multiple_of((shared // 8) * 8, 8)

        cp_r = pltpu.make_async_copy(
            xr_hbm.at[pl.ds(sh8, SWE8), pl.ds(col0, CT)], win_r, in_sem
        )
        cp_i = pltpu.make_async_copy(
            xi_hbm.at[pl.ds(sh8, SWE8), pl.ds(col0, CT)], win_i, in_sem
        )
        cp_r.start()
        cp_i.start()
        cp_r.wait()
        cp_i.wait()

        # Barrel alignment: window row 0 becomes x[base_c] for every c.
        # Stages run LARGEST shift first, each clipped to the rows that can
        # still be read downstream (chunks only ever touch [0, SW8); after
        # stage b the remaining shift is < 2^b) — bit-identical to the
        # full-width ascending barrel on every row that is ever read, at
        # ~2/3 the row traffic (SWE8 >> SW8 once the whole-block drift
        # slack is counted).
        r = base - sh8                                   # (1, CT) in [0, spread+8]
        for b in reversed(range(nb)):
            sh = 1 << b
            keep = min(SWE8, _r8(SW8 + sh))
            src = min(SWE8, _r8(keep + sh))
            bit = ((r >> b) & 1) > 0                     # (1, CT)
            cur_r = win_r[:src]
            cur_i = win_i[:src]
            avail = src - sh
            if avail >= keep:
                sh_r = cur_r[sh : sh + keep]
                sh_i = cur_i[sh : sh + keep]
            else:
                z = jnp.zeros((keep - avail, CT), jnp.float32)
                sh_r = jnp.concatenate([cur_r[sh:src], z], axis=0)
                sh_i = jnp.concatenate([cur_i[sh:src], z], axis=0)
            win_r[:keep] = jnp.where(bit, sh_r, cur_r[:keep])
            win_i[:keep] = jnp.where(bit, sh_i, cur_i[:keep])

        state = (mu, om, ii, p1r, p2r, p3r, p1i, p2i, p3i,
                 c1r, c2r, c3r, c1i, c2i, c3i)
        for m in range(superchunks):
            (mu, om, ii, p1r, p2r, p3r, p1i, p2i, p3i,
             c1r, c2r, c3r, c1i, c2i, c3i) = state
            # Chunk window: slice at the static aligned offset, then a
            # second-level mini-barrel by the per-channel residual so that
            # row 0 = x[ii] exactly.  From here each symbol's interpolation
            # reads only rows [0, 8) — no dense masked evaluation — and a
            # two-way shift-select (advance is provably a0 or a0+1)
            # restores the alignment after every symbol.
            rel0 = ii - base - w08[m]                    # (1, CT) >= 0
            cw_r = win_r[pl.ds(w08[m], SL), :]
            cw_i = win_i[pl.ds(w08[m], SL), :]
            # Mini-barrel, largest shift first with per-stage clipping to
            # the rows the remaining shifts can still reach (the chunk
            # only ever reads CW0 rows) — same dead-row elimination as the
            # super barrel above, bit-identical on every read row.
            CW0 = chunk * (a0 + 1) + INTERP_TAPS
            width = SL
            for b in reversed(range(nb2)):
                sh = 1 << b
                keep = min(width, CW0 + sh)
                bit = ((rel0 >> b) & 1) > 0
                if sh + keep <= width:
                    sh_r = cw_r[sh : sh + keep]
                    sh_i = cw_i[sh : sh + keep]
                else:
                    zpad = jnp.zeros((sh + keep - width, CT), jnp.float32)
                    sh_r = jnp.concatenate([cw_r[sh:width], zpad], axis=0)
                    sh_i = jnp.concatenate([cw_i[sh:width], zpad], axis=0)
                cw_r = jnp.where(bit, sh_r, cw_r[:keep])
                cw_i = jnp.where(bit, sh_i, cw_i[:keep])
                width = keep
            cw_r = cw_r[:CW0]
            cw_i = cw_i[:CW0]

            if block_update:
                # Frozen-clock block update: positions pos_j = mu + j*omega
                # for the whole K=chunk-symbol chunk are known upfront, so
                # the K dense masked interpolations carry no per-symbol
                # dependency (no shift chain), and the M&M loop filter
                # becomes a parallel cumsum over the K errors — the exact
                # algorithm of clock_recovery.clock_recovery_block_update_
                # batch (same approximation; K=1 degenerates to the exact
                # kernel).
                w_iota = jax.lax.broadcasted_iota(jnp.int32, (CW0, CT), 0)
                wf = w_iota.astype(jnp.float32)
                AW = jnp.cos(jnp.float32(math.pi / 4.0) * wf)
                BW = jnp.sin(jnp.float32(math.pi / 4.0) * wf)
                SGNW = 1.0 - 2.0 * (wf % 2.0)             # (-1)^w
                p0rs, p0is, c0rs, c0is, vs = [], [], [], [], []
                for j in range(chunk):
                    posj = mu + jnp.float32(j) * om       # (1, CT)
                    ilf = jnp.floor(posj)
                    fr = posj - ilf
                    il = ilf.astype(jnp.int32)
                    vs.append(ii + il < limit)
                    if interp_mode == "mmse":
                        trow = _mmse_taps8(fr)            # (8, CT)
                        t = jnp.zeros((CW0, CT), jnp.float32)
                        for k in range(INTERP_TAPS):
                            t = jnp.where(
                                w_iota == il + k, trow[k : k + 1, :], t
                            )
                        p0r = jnp.sum(cw_r * t, axis=0, keepdims=True)
                        p0i = jnp.sum(cw_i * t, axis=0, keepdims=True)
                    else:
                        # Taps via angle addition: u = w - il - 3 - fr;
                        #   sin(pi u)   = (-1)^w (-1)^il sin(pi fr)
                        #   cos(pi u/4) = cos(pi w/4) cos(a)
                        #               + sin(pi w/4) sin(a)
                        #                 with a = pi/4 (il + 3 + fr)
                        sgn_il = 1.0 - 2.0 * (ilf % 2.0)
                        sin_fr = jnp.sin(pi_c * fr) * sgn_il  # (1, CT)
                        av = (ilf + 3.0 + fr) * jnp.float32(math.pi / 4.0)
                        cos_a = jnp.cos(av)
                        sin_a = jnp.sin(av)
                        u = wf - ilf - 3.0 - fr               # (CW0, CT)
                        in_tap = (
                            (w_iota >= il) & (w_iota < il + INTERP_TAPS)
                        )
                        wwin = 0.54 + 0.46 * (AW * cos_a + BW * sin_a)
                        sinc = jnp.where(
                            u == 0.0, 1.0, SGNW * sin_fr / (pi_c * u)
                        )
                        t = jnp.where(in_tap, sinc * wwin, 0.0)
                        tsum = jnp.sum(t, axis=0, keepdims=True)
                        p0r = jnp.sum(cw_r * t, axis=0, keepdims=True) / tsum
                        p0i = jnp.sum(cw_i * t, axis=0, keepdims=True) / tsum
                    p0rs.append(p0r)
                    p0is.append(p0i)
                    c0rs.append(jnp.where(p0r > 0, 1.0, 0.0))
                    c0is.append(jnp.where(p0i > 0, 1.0, 0.0))

                # ext[j+1] = 2-back of symbol j; ext[j+2] = 1-back (the
                # GR lag convention, pinned by tests/test_demod_kat.py).
                ext_pr = [p3r, p2r, p1r] + p0rs
                ext_pi = [p3i, p2i, p1i] + p0is
                ext_cr = [c3r, c2r, c1r] + c0rs
                ext_ci = [c3i, c2i, c1i] + c0is
                es, om_js = [], []
                cum = jnp.zeros_like(mu)
                for j in range(chunk):
                    e = (
                        (p0rs[j] - ext_pr[j + 1]) * ext_cr[j + 2]
                        + (p0is[j] - ext_pi[j + 1]) * ext_ci[j + 2]
                        - (
                            (c0rs[j] - ext_cr[j + 1]) * ext_pr[j + 2]
                            + (c0is[j] - ext_ci[j + 1]) * ext_pi[j + 2]
                        )
                    )
                    e = jnp.where(vs[j], jnp.clip(e, -1.0, 1.0), 0.0)
                    es.append(e)
                    cum = cum + e
                    dom = jnp.clip(
                        (om - omega_mid) + gain_omega * cum,
                        -omega_lim, omega_lim,
                    )
                    om_js.append(omega_mid + dom)

                adv = jnp.zeros_like(mu)
                nvalid = jnp.zeros_like(ii)
                for j in range(chunk):
                    adv = adv + jnp.where(
                        vs[j], om_js[j] + gain_mu * es[j], 0.0
                    )
                    nvalid = nvalid + vs[j].astype(jnp.int32)
                    col = m * chunk + j
                    ob_r[col : col + 1, :] = jnp.where(vs[j], p0rs[j], 0.0)
                    ob_i[col : col + 1, :] = jnp.where(vs[j], p0is[j], 0.0)
                    ob_v[col : col + 1, :] = jnp.where(vs[j], 1.0, 0.0)
                pos_end = mu + adv
                ifl = jnp.floor(pos_end)
                mu = pos_end - ifl
                ii = ii + ifl.astype(jnp.int32)
                for j in range(chunk):
                    om = jnp.where(nvalid == j + 1, om_js[j], om)

                # Histories = the last three valid symbols (validity is
                # monotone in j): ext[nvalid + 2 - d] for d = 0, 1, 2.
                def _sel(ext, d):
                    h = ext[2 - d]
                    for j in range(1, chunk + 1):
                        h = jnp.where(nvalid == j, ext[j + 2 - d], h)
                    return h

                p1r, p2r, p3r = _sel(ext_pr, 0), _sel(ext_pr, 1), _sel(ext_pr, 2)
                p1i, p2i, p3i = _sel(ext_pi, 0), _sel(ext_pi, 1), _sel(ext_pi, 2)
                c1r, c2r, c3r = _sel(ext_cr, 0), _sel(ext_cr, 1), _sel(ext_cr, 2)
                c1i, c2i, c3i = _sel(ext_ci, 0), _sel(ext_ci, 1), _sel(ext_ci, 2)
                state = (mu, om, ii, p1r, p2r, p3r, p1i, p2i, p3i,
                         c1r, c2r, c3r, c1i, c2i, c3i)
                continue

            for j in range(chunk):
                valid = ii < limit                       # (1, CT)
                if interp_mode == "mmse":
                    t = _mmse_taps8(mu)                  # (8, CT), as-is
                else:
                    u = k_iota.astype(jnp.float32) - 3.0 - mu     # (8, CT)
                    # Angle-addition taps: with u = k - 3 - mu (k integer),
                    #   sin(pi u)     = (-1)^k sin(pi mu)
                    #   cos(pi u / 4) = cos(pi(k-3)/4) cos(pi mu/4)
                    #                 + sin(pi(k-3)/4) sin(pi mu/4)
                    # so the transcendentals run on (1, CT) vectors, not
                    # the full (8, CT) tap grid (same formula as the XLA
                    # kernel to float rounding).
                    sin_mu = jnp.sin(pi_c * mu)              # (1, CT)
                    cos_q = jnp.cos(jnp.float32(math.pi / 4.0) * mu)
                    sin_q = jnp.sin(jnp.float32(math.pi / 4.0) * mu)
                    wwin = 0.54 + 0.46 * (A_K * cos_q + B_K * sin_q)
                    sgn = SGN_K
                    pu = pi_c * u
                    sinc = jnp.where(u == 0.0, 1.0, sgn * sin_mu / pu)
                    t = sinc * wwin
                    t = t / jnp.sum(t, axis=0, keepdims=True)
                p0r = jnp.sum(cw_r[:INTERP_TAPS] * t, axis=0, keepdims=True)
                p0i = jnp.sum(cw_i[:INTERP_TAPS] * t, axis=0, keepdims=True)

                c0r = jnp.where(p0r > 0, 1.0, 0.0)
                c0i = jnp.where(p0i > 0, 1.0, 0.0)
                # e = Re[(p0 - p_2T) conj(c_1T) - (c0 - c_2T) conj(p_1T)]
                # — the GR lag-1/lag-2 convention (tests/test_demod_kat.py).
                e = (
                    (p0r - p2r) * c1r
                    + (p0i - p2i) * c1i
                    - ((c0r - c2r) * p1r + (c0i - c2i) * p1i)
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

                col = m * chunk + j                      # static row index
                vf = valid
                ob_r[col : col + 1, :] = jnp.where(vf, p0r, 0.0)
                ob_i[col : col + 1, :] = jnp.where(vf, p0i, 0.0)
                ob_v[col : col + 1, :] = jnp.where(vf, 1.0, 0.0)

                # Keep row 0 = x[ii]: shift by whichever advance happened
                # (a0 or a0+1 — provably the only two).  Only the rows the
                # REMAINING symbols of this chunk can touch are kept, so
                # each shift moves a shrinking window and the last symbol
                # skips the shift entirely.  Shifting on invalid (masked)
                # symbols is harmless — all later symbols are invalid too.
                if j < chunk - 1:
                    rnext = (chunk - 1 - j) * (a0 + 1) + INTERP_TAPS
                    hi = (adv.astype(jnp.int32) == a0 + 1)
                    cw_r = jnp.where(
                        hi, cw_r[a0 + 1 : a0 + 1 + rnext], cw_r[a0 : a0 + rnext]
                    )
                    cw_i = jnp.where(
                        hi, cw_i[a0 + 1 : a0 + 1 + rnext], cw_i[a0 : a0 + rnext]
                    )

                mu = jnp.where(vf, new_mu, mu)
                om = jnp.where(vf, new_om, om)
                ii = jnp.where(vf, new_ii, ii)
                p1r, p2r, p3r = (
                    jnp.where(vf, p0r, p1r), jnp.where(vf, p1r, p2r),
                    jnp.where(vf, p2r, p3r),
                )
                p1i, p2i, p3i = (
                    jnp.where(vf, p0i, p1i), jnp.where(vf, p1i, p2i),
                    jnp.where(vf, p2i, p3i),
                )
                c1r, c2r, c3r = (
                    jnp.where(vf, c0r, c1r), jnp.where(vf, c1r, c2r),
                    jnp.where(vf, c2r, c3r),
                )
                c1i, c2i, c3i = (
                    jnp.where(vf, c0i, c1i), jnp.where(vf, c1i, c2i),
                    jnp.where(vf, c2i, c3i),
                )
            state = (mu, om, ii, p1r, p2r, p3r, p1i, p2i, p3i,
                     c1r, c2r, c3r, c1i, c2i, c3i)

        # Flush this super-chunk's symbol rows.
        row0 = pl.multiple_of(s * cols, 8)
        for ref, hbmref in ((ob_r, sr_hbm), (ob_i, si_hbm), (ob_v, vd_hbm)):
            cp = pltpu.make_async_copy(
                ref, hbmref.at[pl.ds(row0, cols), pl.ds(col0, CT)], out_sem
            )
            cp.start()
            cp.wait()
        return state

    # All per-channel vectors stay rank-2 (1, CT): Mosaic's layout
    # inference rejects rank-1 vectors in elementwise joins.
    init = (
        mu_ref[0:1, :], om_ref[0:1, :], ii_ref[0:1, :],
        pr_ref[0:1, :], pr_ref[1:2, :], pr_ref[2:3, :],
        pi_ref[0:1, :], pi_ref[1:2, :], pi_ref[2:3, :],
        cr_ref[0:1, :], cr_ref[1:2, :], cr_ref[2:3, :],
        ci_ref[0:1, :], ci_ref[1:2, :], ci_ref[2:3, :],
    )
    (mu, om, ii, p1r, p2r, p3r, p1i, p2i, p3i,
     c1r, c2r, c3r, c1i, c2i, c3i) = jax.lax.fori_loop(
        0, num_supers, super_body, init
    )
    mu_o[0:1, :] = mu
    om_o[0:1, :] = om
    ii_o[0:1, :] = ii
    for o_ref, (a, b, c) in (
        (pr_o, (p1r, p2r, p3r)),
        (pi_o, (p1i, p2i, p3i)),
        (cr_o, (c1r, c2r, c3r)),
        (ci_o, (c1i, c2i, c3i)),
    ):
        o_ref[0:1, :] = a
        o_ref[1:2, :] = b
        o_ref[2:3, :] = c


def _clock_pallas_core(
    xr_T: jax.Array,
    xi_T: jax.Array,
    n: int,
    state: ClockRecoveryState,
    params: ClockRecoveryParams,
    num_slots: int,
    chunk: int,
    superchunks: int,
    ct: int | None,
    interpret: bool,
    block_update: bool = False,
    interp_mode: str = "sinc",
):
    """Shared kernel launch: channels-last staged input (n+pad rows, C) ->
    raw channels-last symbol planes + final state vectors."""
    C = xr_T.shape[-1]
    if ct is None:
        ct = next((w for w in (256, 512, 128) if C % w == 0), 128)
    if C % ct:
        raise ValueError(f"channels {C} must be a multiple of tile {ct}")
    w08, a0, RELMAX, CW, SL, SW8, spread, SWE8 = _geometry(
        params, chunk, superchunks, num_slots
    )
    cols = superchunks * chunk
    num_supers = -(-num_slots // cols)
    out_rows = num_supers * cols
    limit = n - INTERP_TAPS

    kernel = functools.partial(
        _mm_kernel,
        CT=ct,
        num_supers=num_supers,
        chunk=chunk,
        superchunks=superchunks,
        w08=w08,
        a0=a0,
        RELMAX=RELMAX,
        CW=CW,
        SL=SL,
        SW8=SW8,
        spread=spread,
        SWE8=SWE8,
        limit=limit,
        params=params,
        block_update=block_update,
        interp_mode=interp_mode,
    )
    f32 = jnp.float32
    # MMSE tap table, transposed + zero-padded to a tile-aligned (8, 256)
    # plane (an 8 KB constant input; unused rows select nothing).  Always
    # passed so the kernel signature is mode-independent.
    from xritdemod_tpu.ops.interp_taps import mmse_taps_table

    tabp = np.zeros((INTERP_TAPS, _TABPAD), np.float32)
    tabp[:, : _NSTEPS + 1] = mmse_taps_table().T
    tab_in = jnp.asarray(tabp)
    grid = (C // ct,)
    vec = lambda: pl.BlockSpec((1, ct), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    hist = lambda: pl.BlockSpec((3, ct), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((out_rows, C), f32),   # sr (rows=symbols)
            jax.ShapeDtypeStruct((out_rows, C), f32),   # si
            jax.ShapeDtypeStruct((out_rows, C), f32),   # valid
            jax.ShapeDtypeStruct((1, C), f32),          # mu
            jax.ShapeDtypeStruct((1, C), f32),          # omega
            jax.ShapeDtypeStruct((1, C), jnp.int32),    # ii
            jax.ShapeDtypeStruct((3, C), f32),          # p re
            jax.ShapeDtypeStruct((3, C), f32),          # p im
            jax.ShapeDtypeStruct((3, C), f32),          # c re
            jax.ShapeDtypeStruct((3, C), f32),          # c im
        ),
        in_specs=[hbm, hbm, vec(), vec(),
                  pl.BlockSpec((1, ct), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  hist(), hist(), hist(), hist(),
                  pl.BlockSpec((INTERP_TAPS, _TABPAD), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(hbm, hbm, hbm, vec(), vec(),
                   pl.BlockSpec((1, ct), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   hist(), hist(), hist(), hist()),
        scratch_shapes=[
            pltpu.VMEM((SWE8, ct), f32),
            pltpu.VMEM((SWE8, ct), f32),
            pltpu.VMEM((cols, ct), f32),
            pltpu.VMEM((cols, ct), f32),
            pltpu.VMEM((cols, ct), f32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        # Channel tiles are independent (state is per-channel): let the
        # grid split across megacore tensorcores where present.
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, dimension_semantics=("parallel",)
        ),
    )(
        xr_T,
        xi_T,
        state.mu[None, :],
        state.omega[None, :],
        state.ii[None, :],
        jnp.swapaxes(state.p.re, 0, 1),
        jnp.swapaxes(state.p.im, 0, 1),
        jnp.swapaxes(state.c.re, 0, 1),
        jnp.swapaxes(state.c.im, 0, 1),
        tab_in,
    )
    return outs


def _clock_state_from_outs(outs, n: int, num_slots: int, tail: CF32):
    sr, si, vd, mu, om, ii, pr, pim, cre, cim = outs
    sr = sr.T[:, :num_slots]
    si = si.T[:, :num_slots]
    valid = vd.T[:, :num_slots] > 0.5
    new_state = ClockRecoveryState(
        mu=mu[0],
        omega=om[0],
        ii=ii[0] - (n - NTAIL),
        p=CF32(jnp.swapaxes(pr, 0, 1), jnp.swapaxes(pim, 0, 1)),
        c=CF32(jnp.swapaxes(cre, 0, 1), jnp.swapaxes(cim, 0, 1)),
        tail=tail,
    )
    return CF32(sr, si), valid, new_state


def _pad_rows(params, chunk, superchunks, num_slots) -> int:
    # Enough zero rows past the data that any sh8 <= n window never clips.
    SWE8 = _geometry(params, chunk, superchunks, num_slots)[7]
    return SWE8 + 8


@functools.partial(
    jax.jit,
    static_argnames=("params", "num_slots", "chunk", "superchunks", "ct",
                     "interpret", "block_update", "interp_mode"),
)
def clock_recovery_block_pallas_batch(
    x: CF32,
    state: ClockRecoveryState,
    params: ClockRecoveryParams,
    num_slots: int,
    chunk: int = 8,
    superchunks: int = 64,
    ct: int | None = None,
    interpret: bool = False,
    block_update: bool = False,
    interp_mode: str = "sinc",
) -> tuple[CF32, jax.Array, ClockRecoveryState]:
    """Pallas path: drop-in for `clock_recovery_block_batch` (same contract).

    `block_update=True` switches the inner loop to the frozen-clock
    K=chunk-symbol block update (the algorithm of `clock_recovery_block_
    update_batch` fused on-chip: parallel interpolation + cumsum loop
    filter; ~no sequential per-symbol chain).

    `(C, T)` CF32 in with `(C,)`-leading state; C must be a multiple of the
    channel tile `ct` (lane width per grid step; None = widest of
    512/256/128 that divides C — wider tiles amortize the per-symbol loop
    across more lanes, measured best at 256).
    """
    C, T = x.re.shape
    xr = jnp.concatenate([state.tail.re, x.re], axis=-1)   # (C, n)
    xi = jnp.concatenate([state.tail.im, x.im], axis=-1)
    n = xr.shape[-1]
    pad = _pad_rows(params, chunk, superchunks, num_slots)
    xr_T = jnp.concatenate(
        [xr.T, jnp.zeros((pad, C), jnp.float32)], axis=0
    )
    xi_T = jnp.concatenate(
        [xi.T, jnp.zeros((pad, C), jnp.float32)], axis=0
    )
    outs = _clock_pallas_core(
        xr_T, xi_T, n, state, params, num_slots, chunk, superchunks, ct,
        interpret, block_update, interp_mode,
    )
    tail = CF32(xr[:, -NTAIL:], xi[:, -NTAIL:])
    return _clock_state_from_outs(outs, n, num_slots, tail)


@functools.partial(
    jax.jit,
    static_argnames=("params", "num_slots", "chunk", "superchunks", "ct",
                     "interpret", "block_update", "interp_mode"),
)
def clock_recovery_block_pallas_batch_cl(
    x: CF32,
    state: ClockRecoveryState,
    params: ClockRecoveryParams,
    num_slots: int,
    chunk: int = 8,
    superchunks: int = 64,
    ct: int | None = None,
    interpret: bool = False,
    block_update: bool = False,
    interp_mode: str = "sinc",
) -> tuple[CF32, jax.Array, ClockRecoveryState]:
    """Channels-last variant: `(T, C)` CF32 input (e.g. straight from the
    fused front-end kernel, ops/frontend_pallas.py) — the big block is
    staged without the `(C, T)` -> channels-last transpose the standard
    entry performs.  State layouts and outputs are identical to
    `clock_recovery_block_pallas_batch` (symbols come back `(C, S)`)."""
    T, C = x.re.shape
    n = T + NTAIL
    pad = _pad_rows(params, chunk, superchunks, num_slots)
    xr_T = jnp.concatenate(
        [jnp.swapaxes(state.tail.re, 0, 1), x.re,
         jnp.zeros((pad, C), jnp.float32)], axis=0
    )
    xi_T = jnp.concatenate(
        [jnp.swapaxes(state.tail.im, 0, 1), x.im,
         jnp.zeros((pad, C), jnp.float32)], axis=0
    )
    outs = _clock_pallas_core(
        xr_T, xi_T, n, state, params, num_slots, chunk, superchunks, ct,
        interpret, block_update, interp_mode,
    )
    tail = CF32(
        jnp.swapaxes(xr_T[n - NTAIL : n], 0, 1),
        jnp.swapaxes(xi_T[n - NTAIL : n], 0, 1),
    )
    return _clock_state_from_outs(outs, n, num_slots, tail)
