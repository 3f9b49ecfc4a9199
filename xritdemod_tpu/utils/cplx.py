"""Complex-as-real-pair representation for TPU.

The TPU has no complex arithmetic units, and the axon PJRT backend rejects
complex64 outright (creation, transfer, and jit all UNIMPLEMENTED).  The
framework therefore carries complex streams as a pytree pair of float32
arrays — which is also the layout XLA vectorizes best (each component is a
dense last-dim-major array; no interleaving).

Host edges (file IO, sockets) convert with `from_complex` / `to_complex`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CF32", "from_complex", "to_complex", "zeros", "full_like_shape"]


class CF32(NamedTuple):
    """A complex array as (real, imag) float32 parts of identical shape."""

    re: jax.Array
    im: jax.Array

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    def __getitem__(self, idx) -> "CF32":  # type: ignore[override]
        return CF32(self.re[idx], self.im[idx])

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o: "CF32") -> "CF32":
        return CF32(self.re + o.re, self.im + o.im)

    def __sub__(self, o: "CF32") -> "CF32":
        return CF32(self.re - o.re, self.im - o.im)

    def __mul__(self, o):
        if isinstance(o, CF32):
            return CF32(
                self.re * o.re - self.im * o.im,
                self.re * o.im + self.im * o.re,
            )
        return CF32(self.re * o, self.im * o)

    def conj(self) -> "CF32":
        return CF32(self.re, -self.im)

    def abs(self) -> jax.Array:
        return jnp.sqrt(self.re * self.re + self.im * self.im)

    def abs2(self) -> jax.Array:
        return self.re * self.re + self.im * self.im


def zeros(shape, dtype=jnp.float32) -> CF32:
    return CF32(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def full_like_shape(x: CF32, shape) -> CF32:
    return CF32(jnp.zeros(shape, x.re.dtype), jnp.zeros(shape, x.re.dtype))


def from_complex(x) -> CF32:
    """Host-side: numpy complex array -> CF32 (device placement by caller)."""
    xn = np.asarray(x)
    return CF32(
        jnp.asarray(np.ascontiguousarray(xn.real), jnp.float32),
        jnp.asarray(np.ascontiguousarray(xn.imag), jnp.float32),
    )


def to_complex(x: CF32) -> np.ndarray:
    """Host-side: CF32 -> numpy complex64."""
    return np.asarray(x.re).astype(np.complex64) + 1j * np.asarray(x.im).astype(
        np.complex64
    )
