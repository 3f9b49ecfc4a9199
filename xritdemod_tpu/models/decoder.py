"""The CADU decode chain as batched jitted steps + a streaming wrapper.

TPU-native re-design of the reference decoder main loop
(/root/reference/decoder/src/newdecoder.cpp:196-406): the reference pulls one
16384-byte coded frame at a time off a TCP socket and runs correlator ->
phase fix -> Viterbi -> NRZ-M -> derandomize -> RS serially per frame; its
flywheel skips the full correlation when locked.  Here the stream is framed
into *batches* of B coded frames, sync is a single vectorized correlation +
argmax, the per-frame flywheel recheck collapses into a cheap batched
`correlate_at` at every expected frame start, and the whole FEC stack runs
on the batch at once.

Frame-boundary state matches the reference exactly:
  - 64 soft symbols of Viterbi warm-up history prepended per frame
    (newdecoder.cpp:272-276); inside a batch the history is simply the
    previous frame's tail in the contiguous stream, and the batch carries a
    64-sample tail pytree across calls.
  - The decoded stream is shifted back 32 bits (newdecoder.cpp:295-297) so
    frame bytes are decoded[4:1028].
  - HRIT applies NRZ-M over the decoded bytes including the history prefix
    (newdecoder.cpp:282-284), which this layout reproduces for free.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu import constants as C
from xritdemod_tpu.ops import correlator as corr_op
from xritdemod_tpu.ops import nrzm as nrzm_op
from xritdemod_tpu.ops import reed_solomon as rs_op
from xritdemod_tpu.ops import viterbi as vit_op
from xritdemod_tpu.utils.bits import pack_bits

__all__ = ["DecoderConfig", "FrameBatch", "CaduDecoder", "StreamDecoder"]

_CODED = C.CODED_FRAME_SIZE          # 16384 soft symbols per coded frame
_HIST = C.LAST_FRAME_DATA_BITS       # 64 soft symbols of Viterbi history
_EXT = _CODED + _HIST


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Decoder operating point (mirrors xritdecoder.cfg keys)."""

    mode: str = "lrit"               # "lrit" | "hrit"
    min_correlation_bits: int = C.MIN_CORRELATION_BITS
    frames_per_block: int = 8        # B coded frames decoded per device step
    # Segment-parallel Viterbi (ops/viterbi_pallas.viterbi_decode_segmented):
    # each frame's 8224 trellis steps decode as S concurrent overlapped
    # windows, cutting the sequential ACS depth ~S-fold.  -1 = auto (8 on
    # TPU, off elsewhere), 0 = plain kernel, >=2 = explicit segment count.
    viterbi_segments: int = -1
    # Warmup/tail overlap (trellis steps) of each segment window.  -1 =
    # auto (128 — measured safe: bit-identical to the exact decoder down
    # to -1 dB Es/N0, while the chain's own post-FEC floor is ~1.5 dB;
    # see docs/VITERBI_MARGIN.md and VITERBI_MARGIN_r02.json).  Raise to
    # 256 for extra margin at a ~2% throughput cost, or set
    # viterbi_segments=0 to force the exact decoder.
    viterbi_overlap: int = -1
    # Corrupted-frame forensics (newdecoder.cpp:323-328): when True, the
    # FrameBatch also carries the wire-quantized coded frame, the
    # post-Viterbi frame bytes, and the RS-corrected bytes, so the host
    # can dump failed frames like ChannelWriter.cpp:25-65.
    forensics: bool = False

    @property
    def lrit(self) -> bool:
        return self.mode == "lrit"

    @property
    def uws(self) -> list[int]:
        # Registration order matches newdecoder.cpp:145-151: UW0 then UW2.
        return (
            [C.LRIT_UW0, C.LRIT_UW2] if self.lrit else [C.HRIT_UW0, C.HRIT_UW2]
        )


class FrameBatch(NamedTuple):
    """Decoded results for one batch of B frames (device arrays)."""

    vcdu: jax.Array          # (B, 892) uint8 payloads
    frame_ok: jax.Array      # (B,) bool — at least one RS block decoded
    sync_ok: jax.Array       # (B,) bool — per-frame corr >= threshold
    scid: jax.Array          # (B,) int32
    vcid: jax.Array          # (B,) int32
    counter: jax.Array       # (B,) int32 24-bit frame counter
    vit_errors: jax.Array    # (B,) int32 corrected coded bits (GetBER)
    rs_errors: jax.Array     # (B, 4) int32 per-block corrections, -1 = fail
    corr: jax.Array          # (B,) float32 sync-word match bits
    word: jax.Array          # (B,) int32 matched UW index (0 = 0 deg)
    sync_word: jax.Array     # (B, 4) uint8 decoded sync marker bytes
    # Forensics (DecoderConfig.forensics=True only, else None): the three
    # stages the reference dumps for failed frames (newdecoder.cpp:323-328).
    coded: jax.Array | None = None      # (B, 16384) int8 wire-form input
    vit_frame: jax.Array | None = None  # (B, 1024) post-Viterbi frame bytes
    rs_frame: jax.Array | None = None   # (B, 1020) RS-corrected bytes


class CaduDecoder:
    """Jitted batched CADU decode: sync readout + FEC stack.

    One device step consumes `(B * 16384,)` aligned soft symbols plus a
    `(64,)` carried history tail and returns a `FrameBatch`.
    """

    def __init__(self, config: DecoderConfig = DecoderConfig()):
        self.config = config
        self._templates = corr_op.make_templates(config.uws)
        B = config.frames_per_block
        self._decode = jax.jit(functools.partial(self._decode_impl, B=B))
        self._decode_frames = jax.jit(self._decode_frames_impl)
        self._decode_multi = jax.jit(self._decode_multi_impl)
        self._sync = jax.jit(self._sync_impl)

    # -- sync acquisition: full correlation over one coded frame ----------
    def _sync_impl(self, soft: jax.Array):
        """`(>=16384+63,)` soft -> (corr, word, pos) over frame-length lags."""
        window = soft[: _CODED + corr_op.UW_BITS - 1]
        counts = corr_op.correlate(window, self._templates)
        return corr_op.best_correlation(counts)

    def init_tail(self) -> jax.Array:
        """Neutral Viterbi history (reference inits to mid-level 128,
        newdecoder.cpp:141-144 — neutral soft 0 here)."""
        return jnp.zeros((_HIST,), jnp.float32)

    # -- shared sync recheck + phase fix ------------------------------------
    def _sync_and_fix(self, frames: jax.Array):
        """`(B, 16384)` raw soft frames -> (fixed frames, word, corr,
        sync_ok): the per-frame flywheel recheck (newdecoder.cpp:218-237,
        vectorized) and the LRIT 180-degree phase fix
        (newdecoder.cpp:267-270; HRIT's NRZ-M self-resolves)."""
        cfg = self.config
        win = frames[:, : corr_op.UW_BITS]
        signs = jnp.where(win < 0, -1.0, 1.0).astype(jnp.float32)
        counts = (corr_op.UW_BITS + signs @ self._templates.T) * 0.5  # (B, W)
        word = jnp.argmax(counts, axis=-1).astype(jnp.int32)
        corr = jnp.max(counts, axis=-1)
        sync_ok = corr >= cfg.min_correlation_bits
        if cfg.lrit:
            sign = jnp.where(word % 2 == 1, -1.0, 1.0)       # (B,)
            fixed = frames * sign[:, None]
        else:
            fixed = frames
        return fixed, word, corr, sync_ok

    # -- the batched decode step ------------------------------------------
    def _decode_impl(self, soft: jax.Array, tail: jax.Array, *, B: int):
        soft = soft.astype(jnp.float32)
        frames, word, corr, sync_ok = self._sync_and_fix(
            soft.reshape(B, _CODED)
        )
        # Each frame's 64-symbol Viterbi history is the previous frame's
        # tail in the contiguous stream (frame 0 uses the carried tail) —
        # pure reshape+concat, no per-frame slicing.
        prev_tails = jnp.concatenate(
            [tail[None, :], frames[:-1, -_HIST:]], axis=0
        )                                                     # (B, 64)
        batch = self._fec_stack(frames, prev_tails, word, corr, sync_ok)
        return batch, frames[-1, -_HIST:]

    def _decode_frames_impl(self, frames: jax.Array, tails: jax.Array):
        """Decode `(B, 16384)` independent frames, each with its OWN
        carried `(B, 64)` history tail — the entry the fused on-device
        receiver uses, where B is the channel axis and consecutive calls
        chain each channel's tail through its own stream."""
        frames = frames.astype(jnp.float32)
        fixed, word, corr, sync_ok = self._sync_and_fix(frames)
        batch = self._fec_stack(fixed, tails, word, corr, sync_ok)
        return batch, fixed[:, -_HIST:]

    def _decode_multi_impl(self, frames: jax.Array, tails: jax.Array):
        """Decode `(B, F, 16384)`: F consecutive frames per stream, tails
        chained within each stream (frame f's Viterbi history is frame
        f-1's tail; frame 0 uses the carried `(B, 64)` tail).  Returns a
        FrameBatch with `(B, F)`-leading fields and `(B, F, 64)` per-frame
        tails (the caller picks the last valid one to carry)."""
        B, F = frames.shape[0], frames.shape[1]
        flat = frames.reshape(B * F, _CODED).astype(jnp.float32)
        fixed, word, corr, sync_ok = self._sync_and_fix(flat)
        fx = fixed.reshape(B, F, _CODED)
        prev = jnp.concatenate(
            [tails[:, None, :], fx[:, :-1, -_HIST:]], axis=1
        )                                                      # (B, F, 64)
        batch = self._fec_stack(
            fixed, prev.reshape(B * F, _HIST), word, corr, sync_ok
        )
        batch = jax.tree.map(
            lambda a: a.reshape((B, F) + a.shape[1:]), batch
        )
        return batch, fx[:, :, -_HIST:]

    # -- the FEC stack (Viterbi -> NRZ-M -> derandomize -> RS -> header) ----
    def _fec_stack(self, frames, prev_tails, word, corr, sync_ok):
        cfg = self.config
        B = frames.shape[0]
        ext = jnp.concatenate([prev_tails, frames], axis=1)   # (B, 16448)

        on_tpu = jax.default_backend() == "tpu"
        segs = cfg.viterbi_segments
        if segs < 0:
            # Auto: enough segments that B*S fills the 128-wide lane axis
            # (L = B*S/8 >= 128), floor 4 so sequential depth still drops
            # for big batches, cap 16 where overlap overhead (2*128/Tseg)
            # starts to dominate.  The fwd kernel itself dispatches per L
            # (viterbi_pallas._decode_bits): register-carry at
            # L<=128, VMEM ping-pong butterfly above — so B=256/S=4
            # (L=128) runs register-carry at ~51k frames/s, while the
            # B=4096 throughput shapes take the ping-pong path (which is
            # ~9% faster there).  Measured B=256: S=4 51.0k, S=8 49.3k,
            # S=16 47.7k frames/s vs 9.3k unsegmented.
            segs = min(16, max(4, 1024 // max(B, 1))) if on_tpu else 0
            # VMEM cap: the segmented kernel's decision planes overflow
            # the 16 MB scoped limit past B*S = 8192 windows (measured:
            # 16384 OOMs); halving S keeps huge batches decodable
            # (B=4096 x S=2: 118k frames/s).
            while segs > 1 and B * segs > 8192:
                segs //= 2
        if on_tpu and segs >= 2 and (B * segs) % 8 == 0:
            from xritdemod_tpu.ops.viterbi_pallas import (
                viterbi_decode_segmented,
            )

            ov = cfg.viterbi_overlap if cfg.viterbi_overlap >= 0 else 128
            bits, vit_errors = viterbi_decode_segmented(
                ext, segments=segs, overlap=ov
            )
        elif on_tpu and B % 8 == 0:
            from xritdemod_tpu.ops.viterbi_pallas import viterbi_decode_pallas

            bits, vit_errors = viterbi_decode_pallas(ext)     # (B, 8224)
        else:
            bits, vit_errors = vit_op.viterbi_decode(ext)     # (B, 8224)
        decoded = pack_bits(bits)                             # (B, 1028)
        if not cfg.lrit:
            decoded = nrzm_op.nrzm_decode_bytes(decoded)

        # Shift back 32 bits of history: frame = decoded[4:1028]
        # (newdecoder.cpp:295-297), then strip the 4-byte sync marker.
        frame = decoded[:, C.LAST_FRAME_DATA // 2 : C.LAST_FRAME_DATA // 2 + C.FRAME_SIZE]
        sync_word = frame[:, : C.SYNC_WORD_BYTES]
        body = frame[:, C.SYNC_WORD_BYTES :]                  # (B, 1020)

        from xritdemod_tpu.ops.derandomizer import derandomize

        body = derandomize(body)
        corrected, rs_errors = rs_op.rs_decode_frame(body)    # (B,1020),(B,4)
        frame_ok = jnp.any(rs_errors != -1, axis=-1) & sync_ok

        # Header parse (newdecoder.cpp:342-349).
        b0 = corrected[:, 0].astype(jnp.int32)
        b1 = corrected[:, 1].astype(jnp.int32)
        scid = ((b0 & 0x3F) << 2) | ((b1 & 0xC0) >> 6)
        vcid = b1 & 0x3F
        counter = (
            (corrected[:, 2].astype(jnp.int32) << 16)
            | (corrected[:, 3].astype(jnp.int32) << 8)
            | corrected[:, 4].astype(jnp.int32)
        )

        vcdu = corrected[:, : C.VCDU_SIZE]
        forensics = {}
        if cfg.forensics:
            q = jnp.clip(frames * C.SYMBOL_SCALE, -128.0, 127.0)
            forensics = dict(
                coded=q.astype(jnp.int8),
                vit_frame=frame,
                rs_frame=corrected,
            )
        return FrameBatch(
            vcdu=vcdu,
            frame_ok=frame_ok,
            sync_ok=sync_ok,
            scid=scid,
            vcid=vcid,
            counter=counter,
            vit_errors=vit_errors,
            rs_errors=rs_errors,
            corr=corr,
            word=word,
            sync_word=sync_word,
            **forensics,
        )

    # -- public API ---------------------------------------------------------
    def sync(self, soft) -> tuple[float, int, int]:
        """Acquire: (corr_bits, word, pos) over one coded frame of lags."""
        corr, word, pos = self._sync(jnp.asarray(soft))
        return float(corr), int(word), int(pos)

    def decode_block(self, soft, tail) -> tuple[FrameBatch, jax.Array]:
        """Decode `(B*16384,)` aligned soft symbols; returns batch + tail."""
        return self._decode(jnp.asarray(soft), tail)

    def decode_frames(self, frames, tails) -> tuple[FrameBatch, jax.Array]:
        """Decode `(B, 16384)` frames with per-frame `(B, 64)` history
        tails; returns (batch, new per-frame tails)."""
        return self._decode_frames(jnp.asarray(frames), tails)


def _start_host_copies(batch) -> None:
    """Kick off async device->host copies for every field of a decoded
    batch.  Consumers pull each field with np.asarray; without this the
    per-transfer link-latency floor (~26 ms on the tunneled chip) is paid
    ~10x serially per batch — the difference between a decoder that keeps
    up with real time and one that falls behind (INTEROP_r05)."""
    for leaf in jax.tree.leaves(batch):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()


@dataclasses.dataclass
class _StreamStats:
    frames: int = 0
    dropped: int = 0
    resyncs: int = 0


class StreamDecoder:
    """Host streaming wrapper: unaligned soft-symbol stream -> frames.

    Replaces the reference's socket loop realign/flywheel state machine
    (newdecoder.cpp:212-263): buffers bytes, acquires sync with one
    vectorized correlation, then decodes in B-frame batches with an
    always-on per-frame recheck; any frame falling below the correlation
    threshold triggers re-acquisition, like `lastFrameOK = false`.
    """

    def __init__(self, config: DecoderConfig = DecoderConfig()):
        self.config = config
        self.decoder = CaduDecoder(config)
        # One-frame decoder for acquisition and stream-tail flush: the
        # 46-of-64 threshold over 16384 lags false-locks readily on noise
        # (as the reference's does), so commit only one frame until a frame
        # actually verifies, then switch to the batched path.
        self._dec1 = (
            self.decoder
            if config.frames_per_block == 1
            else CaduDecoder(
                dataclasses.replace(config, frames_per_block=1)
            )
        )
        self._buf = np.zeros(0, np.float32)
        # Incoming chunks accumulate here and merge into _buf only when a
        # decode/acquire actually needs them: concatenating the full
        # backlog on EVERY small push is O(backlog^2) — with a 16 KB wire
        # chunk size and a multi-MB catch-up backlog that memcpy tax alone
        # held the live decoder below real time (INTEROP_r05).
        self._pending: list[np.ndarray] = []
        self._plen = 0
        self._tail = self.decoder.init_tail()
        self._locked = False
        self._verified = False   # a frame passed sync since (re)acquisition
        self._pos = 0
        self.stats = _StreamStats()

    @property
    def buffered(self) -> int:
        """Symbols awaiting decode (realign buffer + pending chunks)."""
        return len(self._buf) + self._plen

    def _materialize(self) -> None:
        if self._plen:
            self._buf = np.concatenate([self._buf] + self._pending)
            self._pending = []
            self._plen = 0

    def _emit(self, batch: FrameBatch) -> FrameBatch:
        sync_ok = np.asarray(batch.sync_ok)
        ok = np.asarray(batch.frame_ok)
        self.stats.frames += int(ok.sum())
        self.stats.dropped += int((~ok).sum())
        if not sync_ok.all():
            self._locked = False     # reacquire, like lastFrameOK = false
            self._verified = False
        elif sync_ok[-1]:
            self._verified = True
        return batch

    def _try_acquire(self) -> bool:
        need_sync = _CODED + corr_op.UW_BITS - 1
        while True:
            if len(self._buf) < need_sync:
                return False
            corr, word, pos = self.decoder.sync(self._buf[:need_sync])
            if corr < self.config.min_correlation_bits:
                # No sync in this frame-length window: slide one frame
                # (the reference drops the chunk, newdecoder.cpp:244-247).
                self._buf = self._buf[_CODED:]
                continue
            self._locked = True
            self._verified = False
            self._pos = pos
            self.stats.resyncs += 1
            return True

    def push(self, soft: np.ndarray) -> list[FrameBatch]:
        """Feed soft symbols (float or int8); returns decoded batches."""
        soft = np.asarray(soft, np.float32)
        self._pending.append(soft)
        self._plen += len(soft)
        B = self.config.frames_per_block
        need_sync = _CODED + corr_op.UW_BITS - 1
        out: list[FrameBatch] = []
        while True:
            if not self._locked:
                if self.buffered < need_sync:
                    break
                self._materialize()
                if not self._try_acquire():
                    break
            nb = B if self._verified else 1
            dec = self.decoder if nb == B else self._dec1
            if self.buffered < self._pos + nb * _CODED:
                break
            self._materialize()
            chunk = self._buf[self._pos : self._pos + nb * _CODED]
            batch, self._tail = dec.decode_block(chunk, self._tail)
            _start_host_copies(batch)
            self._buf = self._buf[self._pos + nb * _CODED :]
            self._pos = 0
            out.append(self._emit(batch))
        return out

    def warm_jit(self) -> float:
        """Compile the sync + both decode programs on zero input before
        real symbols arrive (serving-style warmup).  The upstream symbol
        sender drops on backpressure exactly like the reference's
        SymbolManager (SymbolManager.cpp:57-84), so paying the one-time
        jit compiles mid-stream would lose frames; the persistent compile
        cache makes warm processes ~1 s.  Returns wall seconds spent."""
        import time as _time

        t0 = _time.perf_counter()
        z = np.zeros(_CODED + corr_op.UW_BITS - 1, np.float32)
        self.decoder.sync(z)
        for dec in {id(self._dec1): self._dec1,
                    id(self.decoder): self.decoder}.values():
            B = dec.config.frames_per_block
            batch, _ = dec.decode_block(
                np.zeros(B * _CODED, np.float32), dec.init_tail()
            )
            _ = np.asarray(batch.corr)    # sync (device->host)
        return _time.perf_counter() - t0

    def flush(self) -> list[FrameBatch]:
        """Decode everything still buffered (stream end / disconnect):
        full B-frame batches first — the backlog can be the better part
        of the stream when the producer outpaced us, and decoding it one
        frame at a time pays the fixed per-dispatch link latency per
        FRAME instead of per BATCH (measured 45 s vs 4 s for a 1000-frame
        backlog, INTEROP_r05) — then the remaining tail one at a time."""
        self._materialize()
        out: list[FrameBatch] = self.push(np.zeros(0, np.float32))
        while True:
            if not self._locked and not self._try_acquire():
                break
            if len(self._buf) < self._pos + _CODED:
                break
            chunk = self._buf[self._pos : self._pos + _CODED]
            batch, self._tail = self._dec1.decode_block(chunk, self._tail)
            _start_host_copies(batch)
            self._buf = self._buf[self._pos + _CODED :]
            self._pos = 0
            out.append(self._emit(batch))
        return out
