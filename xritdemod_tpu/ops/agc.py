"""Automatic gain control as an exactly-parallel first-order linear recurrence.

Semantics follow GNU Radio `agc_cc` / SatHelper `AGC(rate, reference, gain,
max_gain)` as constructed at /root/reference/demodulator/src/demodulator.cpp:447
with constants from Parameters.h:34-37:

    out[n]  = x[n] * g[n]
    g[n+1]  = g[n] + rate * (reference - |x[n]| * g[n])
            = (1 - rate*|x[n]|) * g[n] + rate*reference
    g clamped to max_gain (if > 0)

The gain recurrence is *linear* in g given |x|, so instead of a per-sample
loop (the reference's `AGC::Work` hot loop) we compute all gains at once with
`jax.lax.associative_scan` over (a, b) affine pairs — O(log T) depth, fully
vectorized on the VPU.

The max-gain clamp is ALSO exact in parallel: the per-step map
g' = min(a*g + b, M) is monotone in g, so the clamped state unrolls to

    g[n] = min( F_{0:n}(g0),  min_{k<n} F_{k+1:n}(M) )
         = pa[n-1] * min( g0, min_{k<n} (M - pb[k]) / pa[k] ) + pb[n-1]

— the same prefix scan plus one cumulative min.  The ratio is evaluated in
log space (pa underflows to 0 over long blocks; the differences of log
prefix sums are well-conditioned), and only for the clamp candidate, so
whenever the clamp does not bind the result is bit-identical to the plain
affine scan.  An exact `lax.scan` path is provided for golden tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from xritdemod_tpu.utils.cplx import CF32

__all__ = ["AgcParams", "agc_init", "agc_block", "agc_block_exact"]


class AgcParams(NamedTuple):
    rate: float = 0.01
    reference: float = 0.5
    gain: float = 1.0
    max_gain: float = 4000.0


def agc_init(params: AgcParams, leading_shape: tuple = ()) -> jax.Array:
    return jnp.full(leading_shape, params.gain, dtype=jnp.float32)


def _affine_compose(left, right):
    """Compose affine maps applied in sequence: right after left."""
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, a2 * b1 + b2


def agc_block(x: CF32, gain: jax.Array, params: AgcParams) -> tuple[CF32, jax.Array]:
    """Apply AGC to a `(..., T)` CF32 block with `(...)` carried gain."""
    mag = x.abs()
    a = 1.0 - params.rate * mag
    b = jnp.full_like(a, params.rate * params.reference)
    # Inclusive prefix gives g[n+1]; shift to get the gain applied at n.
    pa, pb = jax.lax.associative_scan(_affine_compose, (a, b), axis=-1)
    g_next = pa * gain[..., None] + pb
    if params.max_gain > 0:
        # Exact parallel clamp (see module docstring): the running minimum
        # over restart-from-M trajectories (M - pb[k]) / pa[k], evaluated
        # in log space because pa underflows over long blocks.  log pa
        # comes from log1p of the exact increment (1 - rate*mag rounds its
        # sub-ulp part away near 1, drifting the cumsum).  (M - pb[k])
        # legitimately goes NEGATIVE while the clamp binds hard, so the
        # two sign classes run as separate log-magnitude cummax/cummin and
        # any negative candidate beats every positive one.
        M = jnp.float32(params.max_gain)
        ax = mag.ndim - 1
        la = jnp.cumsum(jnp.log1p(-params.rate * mag), axis=-1)
        diff = M - pb
        neg = diff < 0
        lmag = jnp.log(jnp.maximum(jnp.abs(diff), 1e-30)) - la
        m_neg = jax.lax.cummax(jnp.where(neg, lmag, -jnp.inf), axis=ax)
        m_pos = jax.lax.cummin(jnp.where(neg, jnp.inf, lmag), axis=ax)
        has_neg = m_neg > -jnp.inf
        cand = jnp.where(
            has_neg,
            pb - jnp.exp(m_neg + la),
            jnp.exp(m_pos + la) + pb,
        )
        g_next = jnp.minimum(jnp.minimum(g_next, cand), M)
    g = jnp.concatenate([gain[..., None], g_next[..., :-1]], axis=-1)
    new_gain = g_next[..., -1]
    return CF32(x.re * g, x.im * g), new_gain


def agc_block_exact(
    x: CF32, gain: jax.Array, params: AgcParams
) -> tuple[CF32, jax.Array]:
    """Reference-exact sequential AGC (for golden tests)."""
    mag = x.abs()

    def step(g, m):
        new_g = g + params.rate * (params.reference - m * g)
        if params.max_gain > 0:
            new_g = jnp.minimum(new_g, params.max_gain)
        return new_g, g

    new_gain, g = jax.lax.scan(step, gain, jnp.moveaxis(mag, -1, 0))
    g = jnp.moveaxis(g, 0, -1)
    return CF32(x.re * g, x.im * g), new_gain
