"""RMS-ratio SNR estimator from the golden-model GNU Radio flowgraph.

The reference C++ demodulator does NOT have this — only its GR prototype
does (/root/reference/demodulator/demod_tcp_qt.py:263-298): the AGC output
feeds two taps, the RRC matched filter (in-band signal + noise) and a
Blackman high-pass above the symbol rate (out-of-band noise only); the
displayed figure is 20*log10(RMS(rrc)/RMS(hpf)).

Here both taps and the ratio run on device per block.  The GR flowgraph
smooths each RMS with a single-pole IIR (alpha = 1e-4, ~10k-sample time
constant); a 131072-sample block spans ~13 such time constants, so the
plain block RMS is an equivalent (slightly less laggy) smoothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from xritdemod_tpu.ops import fir
from xritdemod_tpu.utils.cplx import CF32

__all__ = ["snr_estimate_db"]


@functools.partial(jax.jit, static_argnames=("rrc_taps", "hpf_taps"))
def snr_estimate_db(
    x: CF32, rrc_taps: tuple, hpf_taps: tuple
) -> jax.Array:
    """`(..., T)` AGC-output block -> `(...)` estimated SNR in dB.

    Taps are static tuples (design once, hash as compile keys).  Uses
    valid-region convolution only (no history carry): the estimate is a
    diagnostic, not a sample-accurate path.
    """
    rrc = jnp.asarray(rrc_taps, jnp.float32)
    hpf = jnp.asarray(hpf_taps, jnp.float32)
    lead = x.re.shape[:-1]
    T = x.re.shape[-1]

    def power(sig: CF32, taps: jax.Array) -> jax.Array:
        re = fir._real_conv(sig.re.reshape(-1, T), taps, 1)
        im = fir._real_conv(sig.im.reshape(-1, T), taps, 1)
        return jnp.mean(re * re + im * im, axis=-1).reshape(lead)

    p_sig = power(x, rrc)
    p_noise = power(x, hpf)
    return 10.0 * jnp.log10(
        jnp.maximum(p_sig, 1e-20) / jnp.maximum(p_noise, 1e-20)
    )
