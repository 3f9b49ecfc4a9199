"""Mueller & Muller symbol-clock recovery (chunked-window scan kernel).

Semantics follow GNU Radio `clock_recovery_mm_cc(omega, gain_omega, mu,
gain_mu, omega_relative_limit)` / SatHelper `ClockRecovery` as constructed at
/root/reference/demodulator/src/demodulator.cpp:449 (golden model
demod_tcp_qt.py:266), per output symbol:

    p0 = interp(x[ii .. ii+7], mu);  c0 = slicer(p0)   # (re>0, im>0) -> {0,1}
    u  = (p0 - p2)*conj(c1) - (c0 - c2)*conj(p1)
    e  = clip(Re(u), +-1)
    omega += gain_omega*e;  omega = omega_mid + clip(omega - omega_mid, +-lim)
    mu += omega + gain_mu*e;  ii += floor(mu);  mu -= floor(mu)

This is the one data-dependent stage in the chain (symbol count varies with
the recovered clock), and the naive form — one `lax.scan` step per symbol,
each gathering an 8-sample window from the full HBM-resident block — costs
~650 us/step on TPU (dominated by the gather).  The TPU-native form here
exploits that omega is hard-limited to +-0.5% and the mu nudge to gain_mu,
so K symbols consume at most K*omega*(1+lim) + K*gain_mu samples: an outer
scan slides one dense S~=300-sample window per K=64 symbols (a single fast
dynamic-slice from HBM), and the inner K-step loop runs entirely on that
VMEM-resident window — measured ~36 ns/symbol at 256 channels, ~18000x the
naive scan, with bit-identical outputs.

The fractional interpolator is selectable (`interp`): the default
"sinc" evaluates 8 windowed-sinc taps at the exact mu; "mmse" is the
GR-parity tabulated 8-tap MMSE interpolator (`ops/interp_taps.py`, the
structure of GR `mmse_fir_interpolator_cc`: 129-row table indexed by
imu = round(mu*128), no runtime normalization).  Both resolve a
fractional delay of 3+mu samples and agree within the chain's SNR bound.
Table lookups are gather-free one-hot contractions (a per-channel row
gather would serialize under vmap — see the window-staging note below).
Complex samples are the CF32 real-pair (utils/cplx.py).

Block boundaries carry a fixed-size input tail so shapes stay static; batch
by `jax.vmap` over channels.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xritdemod_tpu.utils.cplx import CF32

__all__ = [
    "ClockRecoveryParams",
    "ClockRecoveryState",
    "clock_recovery_init",
    "clock_recovery_block",
    "clock_recovery_block_batch",
    "clock_recovery_block_update_batch",
    "max_symbols",
    "NTAIL",
    "INTERP_TAPS",
]

INTERP_TAPS = 8
# Fixed-size carry of raw samples across block boundaries.  Must exceed
# INTERP_TAPS + ceil(max omega); 32 is comfortably safe for sps <= 20.
NTAIL = 32


def _mmse_rows(mu: jax.Array) -> jax.Array:
    """Tabulated MMSE tap rows for `mu` of any shape -> `mu.shape + (8,)`.

    GR semantics: imu = round(mu * 128), row lookup from the 129-row
    table.  Rounding is floor(x + 0.5) — identical in the Pallas kernel
    (Mosaic has no round-half-even); differs from GR's rint only at exact
    ties of mu*128, a measure-zero event for an accumulated float mu.
    The lookup is a one-hot contraction, not a gather: each output has
    exactly one nonzero product, so the sum is exact in float and
    identical across backends/reduction orders, and nothing serializes
    under vmap.
    """
    from xritdemod_tpu.ops.interp_taps import NSTEPS, mmse_taps_table

    tab = jnp.asarray(mmse_taps_table())                     # (129, 8)
    imu = jnp.clip(
        jnp.floor(mu * NSTEPS + 0.5).astype(jnp.int32), 0, NSTEPS
    )
    onehot = (
        imu[..., None] == jnp.arange(NSTEPS + 1, dtype=jnp.int32)
    ).astype(jnp.float32)                                    # (..., 129)
    return jax.lax.dot_general(
        onehot, tab,
        (((onehot.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (..., 8)


class ClockRecoveryParams(NamedTuple):
    omega: float                 # nominal samples/symbol (omega_mid)
    gain_omega: float
    gain_mu: float
    omega_relative_limit: float = 0.005


class ClockRecoveryState(NamedTuple):
    mu: jax.Array      # () f32
    omega: jax.Array   # () f32
    ii: jax.Array      # () i32, index into [tail | block]
    p: CF32            # (3,) sample history  [p0, p1, p2]
    c: CF32            # (3,) slicer history  [c0, c1, c2]
    tail: CF32         # (NTAIL,) last samples of previous extended block


def clock_recovery_init(
    params: ClockRecoveryParams, mu: float = 0.5
) -> ClockRecoveryState:
    z3 = CF32(jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32))
    zt = CF32(jnp.zeros(NTAIL, jnp.float32), jnp.zeros(NTAIL, jnp.float32))
    return ClockRecoveryState(
        mu=jnp.float32(mu),
        omega=jnp.float32(params.omega),
        ii=jnp.int32(NTAIL),   # start at the head of the fresh block
        p=z3,
        c=z3,
        tail=zt,
    )


def max_symbols(block_len: int, params: ClockRecoveryParams) -> int:
    """Static output-slot budget for a block of `block_len` input samples."""
    min_omega = params.omega * (1.0 - params.omega_relative_limit)
    return int(math.ceil((block_len + NTAIL) / min_omega)) + 4


def _interp_taps(mu: jax.Array) -> jax.Array:
    """8 windowed-sinc taps resolving fractional delay 3+mu."""
    k = jnp.arange(INTERP_TAPS, dtype=jnp.float32)
    u = k - 3.0 - mu
    w = 0.54 + 0.46 * jnp.cos(jnp.float32(math.pi / 4.0) * u)
    taps = jnp.sinc(u) * w
    return taps / jnp.sum(taps)


def _window_size(params: ClockRecoveryParams, chunk: int) -> int:
    """Worst-case samples covered by `chunk` symbols plus interp margin."""
    return (
        int(
            math.ceil(
                chunk * params.omega * (1.0 + params.omega_relative_limit)
                + chunk * params.gain_mu
                + 2 * INTERP_TAPS
            )
        )
        + 4
    )


def clock_recovery_block(
    x: CF32,
    state: ClockRecoveryState,
    params: ClockRecoveryParams,
    num_slots: int,
    chunk: int = 64,
    unroll: int = 4,
    interp: str = "sinc",
) -> tuple[CF32, jax.Array, ClockRecoveryState]:
    """Recover symbols from one `(T,)` CF32 block.

    Returns `(symbols, valid, new_state)` where `symbols: (>=num_slots,)`
    CF32 (padded up to a multiple of `chunk` then truncated) and
    `valid: (num_slots,)` bool marks real outputs (the count is
    data-dependent; invalid slots are zero).  Batch by `jax.vmap`.
    """
    omega_mid = jnp.float32(params.omega)
    omega_lim = jnp.float32(params.omega * params.omega_relative_limit)
    gain_omega = jnp.float32(params.gain_omega)
    gain_mu = jnp.float32(params.gain_mu)

    xr = jnp.concatenate([state.tail.re, x.re])
    xi = jnp.concatenate([state.tail.im, x.im])
    n = xr.shape[0]
    limit = n - INTERP_TAPS   # GR: process while ii < ninput - taps
    S = _window_size(params, chunk)
    n_outer = -(-num_slots // chunk)

    s_iota = jnp.arange(S, dtype=jnp.int32)

    def inner_step(carry, _):
        mu, omega, ii, base, pr, pi, cr, ci, wr, wi = carry
        valid = ii < limit
        il = jnp.clip(ii - base, 0, S - INTERP_TAPS)

        # Gather-free window extraction: under vmap a per-channel
        # dynamic_slice lowers to an XLA gather that serializes channel
        # rows (~50 us each on TPU — 14 s/block at 256 channels).  Instead
        # evaluate the 8 interpolator taps *in place* over the whole
        # S-lane window with a validity mask — pure elementwise VPU work,
        # identical taps, no data-dependent addressing.
        offs = s_iota - il
        if interp == "mmse":
            rows = _mmse_rows(mu)                       # (8,)
            t = jnp.zeros((S,), jnp.float32)
            for k in range(INTERP_TAPS):
                t = jnp.where(offs == k, rows[k], t)
        else:
            in_tap = (offs >= 0) & (offs < INTERP_TAPS)
            u = offs.astype(jnp.float32) - 3.0 - mu
            wwin = 0.54 + 0.46 * jnp.cos(jnp.float32(math.pi / 4.0) * u)
            t = jnp.where(in_tap, jnp.sinc(u) * wwin, 0.0)
            t = t / jnp.sum(t)
        p0r = jnp.sum(wr * t)
        p0i = jnp.sum(wi * t)
        # GR slicer_0deg: component -> 1.0 if > 0 else 0.0
        c0r = jnp.where(p0r > 0, 1.0, 0.0)
        c0i = jnp.where(p0i > 0, 1.0, 0.0)
        # e = Re[(p0 - p2)*conj(c1) - (c0 - c2)*conj(p1)] with the GR
        # lag convention: pr[0]/cr[0] are ONE symbol back (p_1T/c_1T),
        # pr[1]/cr[1] two back (p_2T/c_2T) — pinned against the scalar
        # transcription in tests/test_demod_kat.py.
        e = (
            (p0r - pr[1]) * cr[0]
            + (p0i - pi[1]) * ci[0]
            - ((c0r - cr[1]) * pr[0] + (c0i - ci[1]) * pi[0])
        )
        e = jnp.clip(e, -1.0, 1.0)

        new_omega = omega + gain_omega * e
        new_omega = omega_mid + jnp.clip(new_omega - omega_mid, -omega_lim, omega_lim)
        new_mu = mu + new_omega + gain_mu * e
        adv = jnp.floor(new_mu)
        new_ii = jnp.maximum(ii + adv.astype(jnp.int32), 0)
        new_mu = new_mu - adv

        new_pr = jnp.stack([p0r, pr[0], pr[1]])
        new_pi = jnp.stack([p0i, pi[0], pi[1]])
        new_cr = jnp.stack([c0r, cr[0], cr[1]])
        new_ci = jnp.stack([c0i, ci[0], ci[1]])

        carry = (
            jnp.where(valid, new_mu, mu),
            jnp.where(valid, new_omega, omega),
            jnp.where(valid, new_ii, ii),
            base,
            jnp.where(valid, new_pr, pr),
            jnp.where(valid, new_pi, pi),
            jnp.where(valid, new_cr, cr),
            jnp.where(valid, new_ci, ci),
            wr,
            wi,
        )
        out = (jnp.where(valid, p0r, 0.0), jnp.where(valid, p0i, 0.0), valid)
        return carry, out

    def outer_step(carry, _):
        mu, omega, ii, pr, pi, cr, ci = carry
        # One dense window per chunk of symbols; the chunk can never walk
        # past base + S by the omega/mu hard limits above.
        base = jnp.clip(ii, 0, n - S)
        wr = jax.lax.dynamic_slice(xr, (base,), (S,))
        wi = jax.lax.dynamic_slice(xi, (base,), (S,))
        c0 = (mu, omega, ii, base, pr, pi, cr, ci, wr, wi)
        (mu, omega, ii, _, pr, pi, cr, ci, _, _), outs = jax.lax.scan(
            inner_step, c0, None, length=chunk, unroll=unroll
        )
        return (mu, omega, ii, pr, pi, cr, ci), outs

    carry0 = (
        state.mu,
        state.omega,
        state.ii,
        state.p.re,
        state.p.im,
        state.c.re,
        state.c.im,
    )
    (mu, omega, ii, pr, pi, cr, ci), (sr, si, valid) = jax.lax.scan(
        outer_step, carry0, None, length=n_outer
    )
    sr = sr.reshape(-1)[:num_slots]
    si = si.reshape(-1)[:num_slots]
    valid = valid.reshape(-1)[:num_slots]

    new_state = ClockRecoveryState(
        mu=mu,
        omega=omega,
        ii=ii - (n - NTAIL),   # re-based onto the next extended block
        p=CF32(pr, pi),
        c=CF32(cr, ci),
        tail=CF32(xr[-NTAIL:], xi[-NTAIL:]),
    )
    return CF32(sr, si), valid, new_state


def _spread_bound(params: ClockRecoveryParams, num_slots: int) -> int:
    """Static bound on max |ii_c - ii_c'| across channels within a block.

    Each symbol advances a channel's clock by omega (hard-limited to
    omega_mid*(1 +- lim)) plus a mu nudge bounded by gain_mu*|e|<=gain_mu,
    so two channels diverge at most 2*(omega_mid*lim + gain_mu) samples per
    symbol.  Block starts are near-aligned (every channel consumes until
    ii >= limit, leaving ii - n in [-(omega_max + taps), 0))."""
    rate = 2.0 * (params.omega * params.omega_relative_limit + params.gain_mu)
    return int(math.ceil(num_slots * rate)) + 48


def _stage_super_window(xr_p, xi_p, base, SW: int, spread: int):
    """Per-channel windows `win[s, c] = x[c, base_c + s]`, gather-free.

    The direct form (vmap'd per-channel `dynamic_slice`) lowers to an XLA
    gather that serializes channel rows — measured 136 ms/block at C=512,
    ~2/3 of the whole clock stage.  Instead: ONE shared-base slice (scalar
    offset — cheap) over the drift envelope, then a *barrel shifter*: for
    each bit b of the per-channel residual r_c = base_c - min(base), shift
    the whole buffer up by 2^b lanes and per-channel select.  log2(spread)
    dense select passes replace the serialized gather; window contents are
    bit-identical.  `xr_p`/`xi_p` must be padded by at least SW + spread.
    """
    C = xr_p.shape[0]
    shared = jnp.min(base)
    r = jnp.clip(base - shared, 0, spread)
    SWE = SW + spread
    er = jax.lax.dynamic_slice(xr_p, (jnp.int32(0), shared), (C, SWE)).T
    ei = jax.lax.dynamic_slice(xi_p, (jnp.int32(0), shared), (C, SWE)).T
    for b in range(max(1, spread.bit_length())):
        sh = 1 << b
        bit = ((r >> b) & 1).astype(bool)[None, :]
        zr = jnp.zeros((sh, C), er.dtype)
        er = jnp.where(bit, jnp.concatenate([er[sh:], zr]), er)
        ei = jnp.where(bit, jnp.concatenate([ei[sh:], zr]), ei)
    return er[:SW], ei[:SW]


def clock_recovery_block_batch(
    x: CF32,
    state: ClockRecoveryState,
    params: ClockRecoveryParams,
    num_slots: int,
    chunk: int = 16,
    superchunks: int = 32,
    unroll: int = 4,
    staging: str = "barrel",
    interp: str = "sinc",
) -> tuple[CF32, jax.Array, ClockRecoveryState]:
    """Batch-native variant: `(C, T)` input, `(C,)`-leading state pytree.

    Mathematically identical to `jax.vmap(clock_recovery_block)` (same
    window contents, taps, and update order) but restructured for TPU:

      - channels-last layout: the window lives as `(S, C)` so tap
        reductions run over sublanes while C channels fill the VPU lanes;
      - *super-chunk staging*: the per-channel window gather (a serialized
        row gather under XLA, ~0.8 ms/chunk at 256 channels) happens once
        per `superchunks` chunks; each chunk's window is then a *static*
        slice of the staged buffer, sized to cover the bounded clock drift
        (omega hard-limited to +-0.5%, mu nudge to gain_mu).

    This is the throughput path used by the channel-parallel receiver.
    """
    C = x.re.shape[0]
    omega_mid = jnp.float32(params.omega)
    omega_lim = jnp.float32(params.omega * params.omega_relative_limit)
    gain_omega = jnp.float32(params.gain_omega)
    gain_mu = jnp.float32(params.gain_mu)
    om = params.omega
    om_max = om * (1.0 + params.omega_relative_limit) + params.gain_mu

    xr = jnp.concatenate([state.tail.re, x.re], axis=-1)   # (C, n)
    xi = jnp.concatenate([state.tail.im, x.im], axis=-1)
    n = xr.shape[-1]
    limit = n - INTERP_TAPS

    # Geometry: chunk m of a super-chunk starts within +-dmax of
    # m*chunk*omega samples past the super base.
    dmax = math.ceil(superchunks * chunk * (om * params.omega_relative_limit
                                            + params.gain_mu)) + 8
    w0 = [max(0, math.floor(m * chunk * om) - dmax) for m in range(superchunks)]
    S = max(
        math.floor(m * chunk * om) + dmax + math.ceil(chunk * om_max)
        + INTERP_TAPS + 4 - w0[m]
        for m in range(superchunks)
    )
    SW = w0[-1] + S
    cols = superchunks * chunk
    n_super = -(-num_slots // cols)

    # Pad so super windows never clip (padded samples die by the ii<limit
    # mask; base = ii then never needs clamping, keeping il in range).
    spread = _spread_bound(params, num_slots) if staging == "barrel" else 0
    pad = jnp.zeros((C, SW + spread), jnp.float32)
    xr_p = jnp.concatenate([xr, pad], axis=-1)
    xi_p = jnp.concatenate([xi, pad], axis=-1)

    s_iota = jnp.arange(S, dtype=jnp.int32)[:, None]        # (S, 1)

    def make_inner(wr, wi, base, woff):
        def inner_step(carry, _):
            mu, omega, ii, pr, pi, cr, ci = carry
            valid = ii < limit
            il = jnp.clip(ii - base - woff, 0, S - INTERP_TAPS)   # (C,)

            offs = s_iota - il[None, :]                          # (S, C)
            if interp == "mmse":
                rowsT = _mmse_rows(mu).T                         # (8, C)
                t = jnp.zeros(offs.shape, jnp.float32)
                for k in range(INTERP_TAPS):
                    t = jnp.where(offs == k, rowsT[k][None, :], t)
            else:
                in_tap = (offs >= 0) & (offs < INTERP_TAPS)
                u = offs.astype(jnp.float32) - 3.0 - mu[None, :]
                wwin = 0.54 + 0.46 * jnp.cos(jnp.float32(math.pi / 4.0) * u)
                t = jnp.where(in_tap, jnp.sinc(u) * wwin, 0.0)
                t = t / jnp.sum(t, axis=0)                       # sublane reduce
            p0r = jnp.sum(wr * t, axis=0)                        # (C,)
            p0i = jnp.sum(wi * t, axis=0)

            c0r = jnp.where(p0r > 0, 1.0, 0.0)
            c0i = jnp.where(p0i > 0, 1.0, 0.0)
            # GR lag convention: rows 0/1 of the history stacks are one/
            # two symbols back (see the serial kernel).
            e = (
                (p0r - pr[1]) * cr[0]
                + (p0i - pi[1]) * ci[0]
                - ((c0r - cr[1]) * pr[0] + (c0i - ci[1]) * pi[0])
            )
            e = jnp.clip(e, -1.0, 1.0)

            new_omega = omega + gain_omega * e
            new_omega = omega_mid + jnp.clip(
                new_omega - omega_mid, -omega_lim, omega_lim
            )
            new_mu = mu + new_omega + gain_mu * e
            adv = jnp.floor(new_mu)
            new_ii = jnp.maximum(ii + adv.astype(jnp.int32), 0)
            new_mu = new_mu - adv

            new_pr = jnp.stack([p0r, pr[0], pr[1]])
            new_pi = jnp.stack([p0i, pi[0], pi[1]])
            new_cr = jnp.stack([c0r, cr[0], cr[1]])
            new_ci = jnp.stack([c0i, ci[0], ci[1]])

            carry = (
                jnp.where(valid, new_mu, mu),
                jnp.where(valid, new_omega, omega),
                jnp.where(valid, new_ii, ii),
                jnp.where(valid[None, :], new_pr, pr),
                jnp.where(valid[None, :], new_pi, pi),
                jnp.where(valid[None, :], new_cr, cr),
                jnp.where(valid[None, :], new_ci, ci),
            )
            out = (
                jnp.where(valid, p0r, 0.0),
                jnp.where(valid, p0i, 0.0),
                valid,
            )
            return carry, out

        return inner_step

    def super_step(carry, _):
        mu, omega, ii, pr, pi, cr, ci = carry
        base = ii                                           # (C,), no clip
        if staging == "barrel":
            win_r, win_i = _stage_super_window(xr_p, xi_p, base, SW, spread)
        else:
            # Per-channel gather (serialized rows — kept for A/B).
            win_r = jax.vmap(
                lambda row, b: jax.lax.dynamic_slice(row, (b,), (SW,))
            )(xr_p, base).T                                 # (SW, C)
            win_i = jax.vmap(
                lambda row, b: jax.lax.dynamic_slice(row, (b,), (SW,))
            )(xi_p, base).T
        st = (mu, omega, ii, pr, pi, cr, ci)
        outs = []
        for m in range(superchunks):
            wr = win_r[w0[m] : w0[m] + S]                   # static slices
            wi = win_i[w0[m] : w0[m] + S]
            st, o = jax.lax.scan(
                make_inner(wr, wi, base, w0[m]), st, None,
                length=chunk, unroll=unroll,
            )
            outs.append(o)
        sr = jnp.concatenate([o[0] for o in outs])          # (cols, C)
        si = jnp.concatenate([o[1] for o in outs])
        vd = jnp.concatenate([o[2] for o in outs])
        return st, (sr, si, vd)

    carry0 = (
        state.mu,
        state.omega,
        state.ii,
        jnp.swapaxes(state.p.re, 0, 1),
        jnp.swapaxes(state.p.im, 0, 1),
        jnp.swapaxes(state.c.re, 0, 1),
        jnp.swapaxes(state.c.im, 0, 1),
    )
    (mu, omega, ii, pr, pi, cr, ci), (sr, si, valid) = jax.lax.scan(
        super_step, carry0, None, length=n_super
    )
    sr = sr.reshape(-1, C).T[:, :num_slots]
    si = si.reshape(-1, C).T[:, :num_slots]
    valid = valid.reshape(-1, C).T[:, :num_slots]

    new_state = ClockRecoveryState(
        mu=mu,
        omega=omega,
        ii=ii - (n - NTAIL),
        p=CF32(jnp.swapaxes(pr, 0, 1), jnp.swapaxes(pi, 0, 1)),
        c=CF32(jnp.swapaxes(cr, 0, 1), jnp.swapaxes(ci, 0, 1)),
        tail=CF32(xr[:, -NTAIL:], xi[:, -NTAIL:]),
    )
    return CF32(sr, si), valid, new_state


def clock_recovery_block_update_batch(
    x: CF32,
    state: ClockRecoveryState,
    params: ClockRecoveryParams,
    num_slots: int,
    chunk: int = 16,
    superchunks: int = 32,
    staging: str = "barrel",
    interp: str = "sinc",
) -> tuple[CF32, jax.Array, ClockRecoveryState]:
    """Block-update M&M: K-symbol parallel interpolation (throughput variant).

    The per-symbol kernel (`clock_recovery_block_batch`) is exact GR
    semantics but fundamentally serial: each symbol's interpolation waits on
    the previous symbol's (mu, omega) update, so the dense tap evaluation
    runs as one scan step per symbol and XLA stages its intermediates
    through HBM.  This variant applies the standard block-processing
    receiver transformation: *freeze* (mu, omega) for a K-symbol chunk so
    all K interpolation positions are known upfront —

        r_j = ii + mu + j*omega            (j = 0..K-1)

    — interpolate all K symbols in ONE fused dense evaluation (a (K, S, C)
    elementwise + reduce that XLA keeps on-chip), then run the *exact*
    per-symbol M&M loop-filter recursion (error, clip, omega clamp, mu/ii
    advance — identical code to the serial kernel) as a cheap scan over
    (C,)-wide vectors only.  The single approximation is that the
    within-chunk gain_mu/gain_omega nudges (|e|<=1, gain_mu=0.0037 -> at
    most ~K*0.004 samples, i.e. <1% of a symbol period at K=16) shift the
    interpolation *positions* one chunk late; the loop state itself evolves
    per symbol exactly.  As K -> 1 this is bit-identical to the serial
    kernel.  Lock behavior and post-FEC bit-exactness are validated in
    tests/test_demod_chain.py.

    Super-chunk staging, geometry, outputs, and carry semantics match
    `clock_recovery_block_batch`.
    """
    C = x.re.shape[0]
    omega_mid = jnp.float32(params.omega)
    omega_lim = jnp.float32(params.omega * params.omega_relative_limit)
    gain_omega = jnp.float32(params.gain_omega)
    gain_mu = jnp.float32(params.gain_mu)
    om = params.omega
    om_max = om * (1.0 + params.omega_relative_limit) + params.gain_mu

    xr = jnp.concatenate([state.tail.re, x.re], axis=-1)   # (C, n)
    xi = jnp.concatenate([state.tail.im, x.im], axis=-1)
    n = xr.shape[-1]
    limit = n - INTERP_TAPS

    dmax = math.ceil(superchunks * chunk * (om * params.omega_relative_limit
                                            + params.gain_mu)) + 8
    w0 = [max(0, math.floor(m * chunk * om) - dmax) for m in range(superchunks)]
    S = max(
        math.floor(m * chunk * om) + dmax + math.ceil(chunk * om_max)
        + INTERP_TAPS + 4 - w0[m]
        for m in range(superchunks)
    )
    SW = w0[-1] + S
    cols = superchunks * chunk
    n_super = -(-num_slots // cols)

    spread = _spread_bound(params, num_slots) if staging == "barrel" else 0
    pad = jnp.zeros((C, SW + spread), jnp.float32)
    xr_p = jnp.concatenate([xr, pad], axis=-1)
    xi_p = jnp.concatenate([xi, pad], axis=-1)

    s_iota = jnp.arange(S, dtype=jnp.int32)[None, :, None]       # (1, S, 1)
    j_iota = jnp.arange(chunk, dtype=jnp.float32)[:, None]       # (K, 1)

    def chunk_step(st, wr, wi, base, woff):
        mu, omega, ii, pr, pi, cr, ci = st       # (C,) / (3, C)
        # Frozen-clock interpolation positions for the whole chunk.
        rel = (
            (ii - base - woff).astype(jnp.float32)[None, :]
            + mu[None, :]
            + j_iota * omega[None, :]
        )                                                         # (K, C)
        il = jnp.floor(rel)
        fr = rel - il
        il_abs = il.astype(jnp.int32) + base[None, :] + woff
        valid = il_abs < limit                                    # (K, C)
        ilc = jnp.clip(il.astype(jnp.int32), 0, S - INTERP_TAPS)

        offs = s_iota - ilc[:, None, :]                           # (K, S, C)
        if interp == "mmse":
            rows = _mmse_rows(fr)                                 # (K, C, 8)
            t = jnp.zeros(offs.shape, jnp.float32)
            for k in range(INTERP_TAPS):
                t = jnp.where(offs == k, rows[:, None, :, k], t)
        else:
            in_tap = (offs >= 0) & (offs < INTERP_TAPS)
            u = offs.astype(jnp.float32) - 3.0 - fr[:, None, :]
            wwin = 0.54 + 0.46 * jnp.cos(jnp.float32(math.pi / 4.0) * u)
            t = jnp.where(in_tap, jnp.sinc(u) * wwin, 0.0)
            t = t / jnp.sum(t, axis=1, keepdims=True)
        p0r = jnp.sum(wr[None] * t, axis=1)                       # (K, C)
        p0i = jnp.sum(wi[None] * t, axis=1)
        c0r = jnp.where(p0r > 0, 1.0, 0.0)
        c0i = jnp.where(p0i > 0, 1.0, 0.0)

        # Parallel loop-filter update.  A per-symbol fold here costs one
        # tiny scan step per symbol (~5 us of fixed overhead each — it was
        # the residual bottleneck).  But the M&M error only depends on the
        # interpolated symbol sequence, which is already parallel: extend
        # it with the 3-deep carry-in history and compute every e_j at
        # once; then omega is a clamped cumulative sum of the clipped
        # errors and the chunk advance a masked sum.  vs the serial fold,
        # the only changes are the omega clamp applied to the cumsum
        # rather than per step (differs only if the trajectory exits and
        # re-enters the limit within one chunk) and interpolation
        # positions already frozen above.  K=1 remains bit-identical.
        K = chunk
        Ar = jnp.concatenate([pr[::-1], p0r])                     # (K+3, C)
        Ai = jnp.concatenate([pi[::-1], p0i])
        Br = jnp.concatenate([cr[::-1], c0r])
        Bi = jnp.concatenate([ci[::-1], c0i])
        # GR lag convention: symbol j's error uses lags one and two —
        # extended-array index j+2 is one back of P(j) (= Ar[j+3]), j+1
        # two back (tests/test_demod_kat.py pins this against the scalar
        # GR transcription).
        e = (
            (p0r - Ar[1 : K + 1]) * Br[2 : K + 2]
            + (p0i - Ai[1 : K + 1]) * Bi[2 : K + 2]
            - (
                (c0r - Br[1 : K + 1]) * Ar[2 : K + 2]
                + (c0i - Bi[1 : K + 1]) * Ai[2 : K + 2]
            )
        )
        e = jnp.where(valid, jnp.clip(e, -1.0, 1.0), 0.0)         # (K, C)

        dom = jnp.clip(
            (omega - omega_mid)[None, :] + gain_omega * jnp.cumsum(e, axis=0),
            -omega_lim,
            omega_lim,
        )
        om_j = omega_mid + dom                                    # (K, C)
        adv = jnp.sum(
            jnp.where(valid, om_j + gain_mu * e, 0.0), axis=0
        )
        pos_end = mu + adv                                        # (C,)
        ifloor = jnp.floor(pos_end)
        mu = pos_end - ifloor
        ii = ii + ifloor.astype(jnp.int32)
        nvalid = jnp.sum(valid.astype(jnp.int32), axis=0)         # (C,)
        omega = jnp.where(nvalid > 0, om_j[-1], omega)
        # omega after the last *valid* symbol (valid is monotone in j):
        omega = jnp.where(
            (nvalid > 0) & (nvalid < K),
            jnp.sum(
                jnp.where(
                    jnp.arange(K, dtype=jnp.int32)[:, None] == nvalid[None, :] - 1,
                    om_j,
                    0.0,
                ),
                axis=0,
            ),
            omega,
        )
        # History = samples/slicers at positions (last-valid - k), k=0..2;
        # the extended arrays make carry-in fall out naturally.
        j_io = jnp.arange(K + 3, dtype=jnp.int32)[:, None]        # (K+3, 1)
        sel = lambda E, d: jnp.sum(
            jnp.where(j_io == nvalid[None, :] + 2 - d, E, 0.0), axis=0
        )
        pr = jnp.stack([sel(Ar, 0), sel(Ar, 1), sel(Ar, 2)])
        pi = jnp.stack([sel(Ai, 0), sel(Ai, 1), sel(Ai, 2)])
        cr = jnp.stack([sel(Br, 0), sel(Br, 1), sel(Br, 2)])
        ci = jnp.stack([sel(Bi, 0), sel(Bi, 1), sel(Bi, 2)])

        out = (
            jnp.where(valid, p0r, 0.0),
            jnp.where(valid, p0i, 0.0),
            valid,
        )
        return (mu, omega, ii, pr, pi, cr, ci), out

    w0_arr = jnp.asarray(w0, jnp.int32)

    def super_step(carry, _):
        mu, omega, ii, pr, pi, cr, ci = carry
        base = ii                                                 # (C,)
        if staging == "barrel":
            win_r, win_i = _stage_super_window(xr_p, xi_p, base, SW, spread)
        else:
            win_r = jax.vmap(
                lambda row, b: jax.lax.dynamic_slice(row, (b,), (SW,))
            )(xr_p, base).T                                       # (SW, C)
            win_i = jax.vmap(
                lambda row, b: jax.lax.dynamic_slice(row, (b,), (SW,))
            )(xi_p, base).T

        # Chunks as a scan over window offsets (one traced chunk body
        # instead of `superchunks` unrolled copies — compile-time matters:
        # the unrolled form took >10 min to compile on TPU).  The window
        # slice is a *shared-offset* sublane dynamic_slice, not a
        # per-channel gather.
        def msc(st, w0m):
            wr = jax.lax.dynamic_slice(win_r, (w0m, 0), (S, C))
            wi = jax.lax.dynamic_slice(win_i, (w0m, 0), (S, C))
            return chunk_step(st, wr, wi, base, w0m)

        st, (sr, si, vd) = jax.lax.scan(
            msc, (mu, omega, ii, pr, pi, cr, ci), w0_arr
        )                                                         # (M, K, C)
        return st, (sr.reshape(cols, C), si.reshape(cols, C), vd.reshape(cols, C))

    carry0 = (
        state.mu,
        state.omega,
        state.ii,
        jnp.swapaxes(state.p.re, 0, 1),
        jnp.swapaxes(state.p.im, 0, 1),
        jnp.swapaxes(state.c.re, 0, 1),
        jnp.swapaxes(state.c.im, 0, 1),
    )
    (mu, omega, ii, pr, pi, cr, ci), (sr, si, valid) = jax.lax.scan(
        super_step, carry0, None, length=n_super
    )
    sr = sr.reshape(-1, C).T[:, :num_slots]
    si = si.reshape(-1, C).T[:, :num_slots]
    valid = valid.reshape(-1, C).T[:, :num_slots]

    new_state = ClockRecoveryState(
        mu=mu,
        omega=omega,
        ii=ii - (n - NTAIL),
        p=CF32(jnp.swapaxes(pr, 0, 1), jnp.swapaxes(pi, 0, 1)),
        c=CF32(jnp.swapaxes(cr, 0, 1), jnp.swapaxes(ci, 0, 1)),
        tail=CF32(xr[:, -NTAIL:], xi[:, -NTAIL:]),
    )
    return CF32(sr, si), valid, new_state
