"""The fused on-device receive: IQ blocks -> VCDU frames in ONE jitted step.

The reference splits the receive across two processes joined by TCP, with
the decoder realigning the symbol stream to frame boundaries on the host
(/root/reference/decoder/src/newdecoder.cpp:212-263).  Round 1 of this
framework still round-tripped soft symbols through host numpy between the
demod and decode device steps (models/decoder.StreamDecoder).  Here the
whole receive is one jitted function per `(C, T)` IQ block:

  demod chain (fused Pallas front-end + clock kernel)
    -> per-channel symbol ring in HBM (ops/ring_pallas.py — barrel-roll
       append at the fill offset, frame-aligned pop at the sync position)
    -> per-channel sync acquisition (one batched UW correlation + argmax,
       the always-on flywheel)
    -> k frame extractions per block, each decoded by the batched FEC
       stack (Viterbi -> NRZ-M -> derandomize -> RS) with per-channel
       Viterbi history tails

with a small carried-state pytree (demod state, ring, fill, lock flags,
tails).  Soft symbols never visit the host; the host sees only decoded
VCDUs and per-frame stats.

Lock state machine (per channel) mirrors the reference flywheel:
unlocked -> full-window correlation picks pos; a frame is popped at pos and
decoded; its per-frame sync recheck >= threshold locks the channel (pos=0
thereafter, frames contiguous); any failed recheck unlocks.  A channel
whose ring lacks a full frame skips the extraction (ok=False) and retries
next block.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xritdemod_tpu import constants as C
from xritdemod_tpu.models.decoder import CaduDecoder, DecoderConfig, FrameBatch
from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator, DemodState
from xritdemod_tpu.ops import correlator as corr_op
from xritdemod_tpu.ops.ring_pallas import ring_append, ring_extract
from xritdemod_tpu.utils.cplx import CF32, from_complex

__all__ = ["RxState", "FusedReceiver"]

_CODED = C.CODED_FRAME_SIZE


class RxState(NamedTuple):
    demod: DemodState
    ring: jax.Array        # (C, L) f32 symbol FIFOs
    fill: jax.Array        # (C,) int32 symbol counts
    locked: jax.Array      # (C,) bool frame lock
    tails: jax.Array       # (C, 64) f32 Viterbi history (phase-fixed domain)


class FusedReceiver:
    """Channel-batched IQ -> VCDUs, fully on-device.

    One `step((C, T) IQ, state)` returns `(batch, ok, overflow, state)`
    where `batch` is a FrameBatch with `(C, k)`-leading fields (k frame
    extraction attempts per block), `ok (C, k)` marks attempts that popped
    a real frame, and `overflow (C,)` marks channels that dropped the
    block's symbols on a full ring (reference FIFO-overflow semantics).
    """

    def __init__(
        self,
        demod_config: DemodConfig,
        decoder_config: DecoderConfig,
        channels: int,
        block_len: int = 1 << 17,
        ring_len: int | None = None,
        extracts_per_step: int | None = None,
        ring_dtype: str = "auto",
    ):
        self.demod_config = demod_config
        self.decoder_config = decoder_config
        self.channels = channels
        self.block_len = block_len
        # Ring storage: bf16 on TPU (half the ring HBM/VMEM traffic; its
        # 8-bit mantissa carries at least the precision of the reference's
        # int8 symbol wire, SymbolManager.cpp:43-46), exact f32 on CPU so
        # the golden StreamDecoder-equivalence tests stay bit-identical.
        if ring_dtype == "auto":
            ring_dtype = (
                "bfloat16"
                if jax.default_backend() == "tpu" and channels % 16 == 0
                else "float32"
            )
        self.ring_dtype = jnp.dtype(ring_dtype)
        self._demod = Demodulator(demod_config, block_len)
        self._dec = CaduDecoder(decoder_config)
        self._templates = corr_op.make_templates(decoder_config.uws)

        S = self._demod.num_slots
        expected = block_len / demod_config.decimation / demod_config.sps
        self.k = extracts_per_step or max(1, math.ceil(expected / _CODED))
        # Ring capacity: worst-case leftover (< pos_max + E) + one block of
        # new symbols + margin; pos_max = one coded frame of acquisition lag.
        L = ring_len or (2 * _CODED + S + 8192)
        L = -(-L // 128) * 128
        if L < 2 * _CODED + S:
            raise ValueError(f"ring_len {L} < {2 * _CODED + S} minimum")
        self.ring_len = L
        self._acq = _CODED + corr_op.UW_BITS - 1
        self._step = jax.jit(self._step_impl)
        self._step_cl = jax.jit(self._step_cl_impl)
        self._step_int8 = jax.jit(self._step_int8_impl)

    def init_state(self) -> RxState:
        Cn, L = self.channels, self.ring_len
        return RxState(
            demod=self._demod.init_state_batch(Cn),
            ring=jnp.zeros((Cn, L), self.ring_dtype),
            fill=jnp.zeros((Cn,), jnp.int32),
            locked=jnp.zeros((Cn,), jnp.bool_),
            tails=jnp.zeros((Cn, C.LAST_FRAME_DATA_BITS), jnp.float32),
        )

    def _step_impl(self, x: CF32, st: RxState):
        return self._after_demod(
            self._demod.block_batch(x, st.demod), st
        )

    def _step_cl_impl(self, xT: CF32, st: RxState):
        # Channels-last ingest: skips the device-side (C, T) -> (T, C)
        # input transpose (see Demodulator.block_batch_cl).
        return self._after_demod(
            self._demod.block_batch_cl(xT, st.demod), st
        )

    def _step_int8_impl(self, q: jax.Array, st: RxState):
        # Quantized wire ingest: `(C, 2T)` interleaved int8 I/Q crosses
        # the host->device link at 1/4 the f32-pair bytes (the link, not
        # the chip, bounds end-to-end rate — LONGRUN budget breakdown);
        # dequantization fuses into the chain's first on-device pass.
        # Mirrors the reference's native 8-bit ingest
        # (demodulator.cpp:54-74, RtlFrontend.cpp:26-28).
        from xritdemod_tpu.utils.cplx import dequantize_iq_s8

        return self._after_demod(
            self._demod.block_batch(dequantize_iq_s8(q), st.demod), st
        )

    def _after_demod(self, demod_out, st: RxState):
        interp = jax.default_backend() != "tpu"
        soft, valid, dstate = demod_out
        # The clock kernel's valid mask is a per-channel prefix (slots are
        # emitted in symbol order), so `soft` is already dense: the count
        # is all the append needs.
        n_new = jnp.sum(valid, axis=-1).astype(jnp.int32)
        ring, fill, ovf = ring_append(
            st.ring, st.fill, soft, n_new, interpret=interp
        )
        locked, tails = st.locked, st.tails

        # Acquisition (the full-window correlator) runs per extraction so
        # the position always reflects the post-pop ring, but ONLY while
        # some channel is unlocked — in steady state every channel is
        # frame-aligned at pos 0 and the whole correlation is skipped.
        def do_acq(r):
            counts = corr_op.correlate(r[:, : self._acq], self._templates)
            corr, _, p = corr_op.best_correlation(counts)
            return corr, p.astype(jnp.int32)

        Cn = ring.shape[0]
        thresh = self.decoder_config.min_correlation_bits

        # k frame extractions, each decoded by one flat decode_frames call
        # (measured faster on TPU than one (C, k) multi-decode at these
        # widths).  A successful unlocked extraction locks (sync verified)
        # and leaves the stream frame-aligned, so later extractions in the
        # same step use pos 0.
        batches, oks = [], []
        for _ in range(self.k):
            acq_corr, acq_pos = jax.lax.cond(
                jnp.any(~locked),
                do_acq,
                lambda r: (jnp.zeros((Cn,), jnp.float32),
                           jnp.zeros((Cn,), jnp.int32)),
                ring,
            )
            # No sync in the window -> slide exactly ONE frame (pos 0),
            # the reference flywheel's blind drop (newdecoder.cpp:244-247):
            # a noise argmax would overshoot past an upcoming sync and
            # swallow the head of the first real frame.
            acq_pos = jnp.where(acq_corr >= thresh, acq_pos, 0)
            pos = jnp.where(locked, 0, acq_pos).astype(jnp.int32)
            ring, fill, chunk, ok = ring_extract(
                ring, fill, pos, _CODED, interpret=interp
            )
            batch, ntails = self._dec._decode_frames(chunk, tails)
            tails = jnp.where(ok[:, None], ntails, tails)
            locked = jnp.where(ok, batch.sync_ok, locked)
            batch = batch._replace(
                frame_ok=batch.frame_ok & ok, sync_ok=batch.sync_ok & ok
            )
            batches.append(batch)
            oks.append(ok)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *batches)
        ok = jnp.stack(oks, axis=1)                       # (C, k)
        return stacked, ok, ovf, RxState(dstate, ring, fill, locked, tails)

    def step(self, x, state: RxState):
        """`(C, T)` IQ block (CF32 or complex numpy) -> (FrameBatch with
        `(C, k)` fields, ok `(C, k)`, overflow `(C,)`, next state)."""
        if not isinstance(x, CF32):
            x = from_complex(x)
        return self._step(x, state)

    def step_cl(self, xT, state: RxState):
        """Channels-last variant: `(T, C)` IQ block (time-major, the
        natural wire order of an interleaved multichannel source) —
        identical results to `step` without the device-side input
        transpose."""
        if not isinstance(xT, CF32):
            xT = from_complex(xT)
        return self._step_cl(xT, state)

    def step_int8(self, q, state: RxState):
        """Quantized-wire variant: `(C, 2T)` interleaved int8 I/Q block
        (`utils.cplx.quantize_iq_s8` layout) — same contract as `step`,
        1/4 the host->device bytes, dequantized on device."""
        import jax.numpy as jnp

        return self._step_int8(jnp.asarray(q), state)
