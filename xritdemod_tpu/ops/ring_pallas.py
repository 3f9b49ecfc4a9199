"""On-device per-channel symbol ring: the demod->decode coupling buffer.

TPU-native replacement for the host hop the reference takes between its two
processes (soft symbols over TCP :5000 and the decoder's realign loop,
/root/reference/decoder/src/newdecoder.cpp:212-263): each channel keeps a
fixed-capacity symbol FIFO in HBM, new demod output is appended at the
per-channel fill offset, and frame-aligned chunks are popped at the
per-channel sync position — so a receive step goes IQ -> VCDUs without the
soft symbols ever visiting the host.

The hard part is per-channel offsets: a `dynamic_slice`/gather with
per-row starts serializes one row at a time on TPU (the clock kernel's
known trap, ops/clock_recovery.py).  Instead every per-channel shift is a
**barrel roll**: ceil(log2(L)) static circular rolls, each selected per
channel by one bit of the shift amount — pure VPU work on lane-contiguous
tiles, identical result to a gather.

Two kernels (both `(R, L)` channel-row tiles resident in VMEM):
  - `ring_append(ring, fill, new, n_new)`: place `new[c, :n_new[c]]` at
    `ring[c, fill[c]:]`.  A channel that would overflow drops the incoming
    block (the reference's FIFO-overflow semantics, SymbolManager.cpp:97-101)
    and reports it.
  - `ring_extract(ring, fill, pos, extract=E)`: pop `ring[c, pos[c]:pos[c]+E]`
    (the decoder realign: everything before `pos` is pre-sync junk and is
    dropped with it).  A channel with fewer than `pos+E` symbols is left
    untouched and reports not-ok.

Invariant maintained: `ring[c, fill[c]:] == 0`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ring_append", "ring_extract"]


def _barrel(x: jax.Array, amt: jax.Array, L: int, left: bool) -> jax.Array:
    """Roll each row of `x (R, L)` by its own `amt (R, 1)` in [0, L)."""
    nbits = max(1, (L - 1).bit_length())
    for k in range(nbits):
        sh = (1 << k) % L
        if sh == 0:
            continue
        r = pltpu.roll(x, (L - sh) if left else sh, axis=1)
        bit = ((amt >> k) & 1) > 0
        x = jnp.where(bit, r, x)
    return x


def _append_kernel(ring_ref, fill_ref, new_ref, n_ref,
                   ring_out, fill_out, ovf_out, *, L, S):
    # Mosaic's lane rotate is 32-bit only, so narrow (bf16) rings convert
    # to f32 at the VMEM edge — HBM traffic stays narrow, rolls run f32.
    ring = ring_ref[:, :].astype(jnp.float32)
    fill = fill_ref[:, :]
    n = n_ref[:, :]
    new = new_ref[:, :].astype(jnp.float32)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, new.shape, 1)
    newm = jnp.where(lane_s < n, new, 0.0)
    buf = jnp.pad(newm, ((0, 0), (0, L - S)))
    ok = (fill + n) <= L
    buf = _barrel(buf, jnp.where(ok, fill, 0), L, left=False)
    # Slots >= fill are zero (invariant) and the rolled buffer is zero
    # outside [fill, fill+n), so merge is a plain add.
    ring_out[:, :] = (ring + jnp.where(ok, buf, 0.0)).astype(
        ring_out.dtype
    )
    fill_out[:, :] = jnp.where(ok, fill + n, fill)
    ovf_out[:, :] = jnp.logical_not(ok).astype(jnp.int32)


def _extract_kernel(ring_ref, fill_ref, pos_ref,
                    ring_out, fill_out, out_ref, ok_out, *, L, E):
    ring = ring_ref[:, :].astype(jnp.float32)  # see _append_kernel note
    fill = fill_ref[:, :]
    pos = pos_ref[:, :]
    ok = fill >= (pos + E)
    rolled = _barrel(ring, jnp.where(ok, pos, 0), L, left=True)
    out_ref[:, :] = rolled[:, :E].astype(out_ref.dtype)
    dropped = pltpu.roll(rolled, L - (E % L), axis=1)
    new_fill = jnp.where(ok, fill - (pos + E), fill)
    ring2 = jnp.where(ok, dropped, ring)
    lane = jax.lax.broadcasted_iota(jnp.int32, ring2.shape, 1)
    ring_out[:, :] = jnp.where(lane < new_fill, ring2, 0.0).astype(
        ring_out.dtype
    )
    fill_out[:, :] = new_fill
    ok_out[:, :] = ok.astype(jnp.int32)


def _rows(C: int, dtype) -> int:
    # 8-row tiles for every dtype: bf16's native (16, 128) tile would
    # double the per-step VMEM working set past the 16 MB scoped limit
    # once the in-kernel f32 roll copies are counted (Mosaic pads the
    # sublanes instead).
    del dtype
    return 8 if C % 8 == 0 else C


@functools.partial(jax.jit, static_argnames=("interpret",))
def _append_call(ring, fill, new, n_new, *, interpret):
    C, L = ring.shape
    S = new.shape[1]
    new = new.astype(ring.dtype)
    R = _rows(C, ring.dtype)
    grid = (C // R,)
    row = lambda i: (i, 0)
    ring2, fill2, ovf = pl.pallas_call(
        functools.partial(_append_kernel, L=L, S=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, L), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, L), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, L), ring.dtype),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
        ],
        interpret=interpret,
    )(ring, fill[:, None], new, n_new[:, None])
    return ring2, fill2[:, 0], ovf[:, 0].astype(jnp.bool_)


@functools.partial(jax.jit, static_argnames=("extract", "interpret"))
def _extract_call(ring, fill, pos, *, extract, interpret):
    C, L = ring.shape
    E = extract
    R = _rows(C, ring.dtype)
    grid = (C // R,)
    row = lambda i: (i, 0)
    ring2, fill2, out, ok = pl.pallas_call(
        functools.partial(_extract_kernel, L=L, E=E),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, L), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, L), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, E), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, L), ring.dtype),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
            jax.ShapeDtypeStruct((C, E), ring.dtype),
            jax.ShapeDtypeStruct((C, 1), jnp.int32),
        ],
        interpret=interpret,
    )(ring, fill[:, None], pos[:, None])
    return ring2, fill2[:, 0], out, ok[:, 0].astype(jnp.bool_)


def ring_append(ring, fill, new, n_new, *, interpret: bool = False):
    """Append `new[c, :n_new[c]]` at each channel's fill offset.

    Args:
      ring: `(C, L)` symbol buffer (slots >= fill zero).
      fill: `(C,)` int32 symbol counts.
      new: `(C, S)` dense new symbols (garbage past `n_new` is masked).
      n_new: `(C,)` int32 valid counts, `n_new <= S`.

    Returns `(ring', fill', overflowed (C,) bool)`; an overflowing channel
    drops the entire incoming block.
    """
    return _append_call(ring, fill, new, n_new, interpret=interpret)


def ring_extract(ring, fill, pos, extract: int, *, interpret: bool = False):
    """Pop `extract` symbols starting at each channel's `pos`.

    Args:
      ring/fill: as above.
      pos: `(C,)` int32 frame-start offsets (pre-`pos` symbols are junk
        dropped with the pop — the decoder realign).
      extract: static number of symbols E to pop per channel.

    Returns `(ring', fill', out (C, E), ok (C,) bool)`; a channel with
    fewer than `pos+E` symbols is untouched (`ok=False`, `out` garbage).
    """
    return _extract_call(ring, fill, pos, extract=extract, interpret=interpret)
