"""Fused on-device receiver: IQ -> VCDUs with no host symbol hop.

Checks the ring kernels against a numpy FIFO reference and the whole fused
step (models/receiver.FusedReceiver, interpret-mode Pallas on CPU) against
the round-1 host path (same demod + models/decoder.StreamDecoder per
channel): every recovered frame must match bit-for-bit, in order.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

# Compile-heavy on XLA:CPU -- excluded from the quick tier (build.sh).
pytestmark = pytest.mark.heavy

from xritdemod_tpu import tx
from xritdemod_tpu.models.decoder import DecoderConfig, StreamDecoder
from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
from xritdemod_tpu.utils.cplx import CF32

sys.path.insert(0, os.path.dirname(__file__))


class TestRingKernels:
    def test_append_extract_matches_numpy_fifo(self, rng):
        from xritdemod_tpu.ops.ring_pallas import ring_append, ring_extract

        C, L, S, E = 8, 1024, 300, 256
        ring = jnp.zeros((C, L), jnp.float32)
        fill = jnp.zeros((C,), jnp.int32)
        ref = [np.zeros(0, np.float32) for _ in range(C)]
        for _ in range(6):
            new = rng.normal(size=(C, S)).astype(np.float32)
            n = rng.integers(100, S + 1, size=C).astype(np.int32)
            ring, fill, ovf = ring_append(
                ring, fill, jnp.asarray(new), jnp.asarray(n), interpret=True
            )
            assert not np.asarray(ovf).any()
            for c in range(C):
                ref[c] = np.concatenate([ref[c], new[c, : n[c]]])
            r, f = np.asarray(ring), np.asarray(fill)
            for c in range(C):
                assert f[c] == len(ref[c])
                np.testing.assert_array_equal(r[c, : f[c]], ref[c])
                assert (r[c, f[c] :] == 0).all()

            pos = rng.integers(0, 60, size=C).astype(np.int32)
            ring, fill, out, ok = ring_extract(
                ring, fill, jnp.asarray(pos), E, interpret=True
            )
            r, f, o, okh = map(np.asarray, (ring, fill, out, ok))
            for c in range(C):
                want = len(ref[c]) >= pos[c] + E
                assert okh[c] == want
                if want:
                    np.testing.assert_array_equal(
                        o[c], ref[c][pos[c] : pos[c] + E]
                    )
                    ref[c] = ref[c][pos[c] + E :]
                assert f[c] == len(ref[c])
                np.testing.assert_array_equal(r[c, : f[c]], ref[c])

    def test_append_overflow_drops_block(self, rng):
        from xritdemod_tpu.ops.ring_pallas import ring_append

        C, L, S = 8, 512, 200
        ring = jnp.asarray(
            np.concatenate(
                [np.ones((C, L - 50), np.float32),
                 np.zeros((C, 50), np.float32)], axis=1,
            )
        )
        fill = jnp.full((C,), L - 50, jnp.int32)
        new = rng.normal(size=(C, S)).astype(np.float32)
        r2, f2, ovf = ring_append(
            ring, fill, jnp.asarray(new),
            jnp.full((C,), S, jnp.int32), interpret=True,
        )
        assert np.asarray(ovf).all()
        assert (np.asarray(f2) == L - 50).all()
        np.testing.assert_array_equal(np.asarray(r2), np.asarray(ring))


def _make_capture(rng, cfg, channels, frames_per_channel):
    """Per-channel IQ captures carrying real CADU streams (distinct VCIDs)."""
    from test_runtime import _modulate

    sigs, vcdus = [], []
    for c in range(channels):
        v = tx.make_vcdus(
            frames_per_channel, scid=13, vcid=c + 1, counter0=100 * c,
            rng=np.random.default_rng(50 + c),
        )
        symbols = tx.encode_stream(
            v, lrit=True, amp=1.0, rng=np.random.default_rng(90 + c)
        )
        sigs.append(_modulate(symbols, cfg, np.random.default_rng(10 + c)))
        vcdus.append(v)
    n = min(len(s) for s in sigs)
    return np.stack([s[:n] for s in sigs]), vcdus


def _frames_of(batchlist):
    """[(channel, vcid, counter, vcdu bytes)] in stream order per batch."""
    out = []
    for b in batchlist:
        ok = np.asarray(b.frame_ok)
        vcid = np.asarray(b.vcid)
        ctr = np.asarray(b.counter)
        vc = np.asarray(b.vcdu)
        for i in range(len(ok)):
            if ok[i]:
                out.append((int(vcid[i]), int(ctr[i]), bytes(vc[i])))
    return out


class TestFusedReceiver:
    def test_matches_stream_decoder_path(self, rng):
        """FusedReceiver (on-device ring + decode) recovers exactly the
        frames the host StreamDecoder path recovers from the same demod
        output, bit-for-bit and in order, per channel."""
        from xritdemod_tpu.models.receiver import FusedReceiver

        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        # frames_per_block=1 so the host reference consumes frames at the
        # same greedy cadence as the fused path (a 2-frame batch leaves a
        # leftover at stream end that only flush() would drain).
        dcfg = DecoderConfig(mode="lrit", frames_per_block=1)
        Cn, T = 4, 1 << 15
        sig, _ = _make_capture(rng, cfg, Cn, frames_per_channel=5)
        nblocks = sig.shape[1] // T

        rx = FusedReceiver(cfg, dcfg, channels=Cn, block_len=T)
        st = rx.init_state()
        fused: list[list] = [[] for _ in range(Cn)]
        for b in range(nblocks):
            x = sig[:, b * T : (b + 1) * T]
            batch, ok, ovf, st = rx.step(x, st)
            assert not np.asarray(ovf).any()
            okh = np.asarray(ok)
            vcid = np.asarray(batch.vcid)
            ctr = np.asarray(batch.counter)
            fok = np.asarray(batch.frame_ok)
            vc = np.asarray(batch.vcdu)
            for c in range(Cn):
                for j in range(rx.k):
                    if okh[c, j] and fok[c, j]:
                        fused[c].append(
                            (int(vcid[c, j]), int(ctr[c, j]),
                             bytes(vc[c, j]))
                        )

        # Reference: identical demod (same function, same blocks), host
        # StreamDecoder per channel.
        demod = Demodulator(cfg, block_len=T)
        dst = demod.init_state_batch(Cn)
        decoders = [StreamDecoder(dcfg) for _ in range(Cn)]
        ref: list[list] = [[] for _ in range(Cn)]
        for b in range(nblocks):
            x = sig[:, b * T : (b + 1) * T]
            xc = CF32(
                jnp.asarray(x.real.astype(np.float32)),
                jnp.asarray(x.imag.astype(np.float32)),
            )
            soft, valid, dst = demod.block_batch(xc, dst)
            sh, vh = np.asarray(soft), np.asarray(valid)
            for c in range(Cn):
                for bb in decoders[c].push(sh[c][vh[c]]):
                    ref[c].extend(_frames_of([bb]))

        for c in range(Cn):
            assert len(fused[c]) > 0, f"channel {c} recovered nothing"
            assert fused[c] == ref[c], (
                f"channel {c}: fused {len(fused[c])} frames != "
                f"stream {len(ref[c])}"
            )

    def test_step_cl_matches_row_major(self, rng):
        """FusedReceiver.step_cl on (T, C) time-major blocks returns
        exactly what step returns on the transposed (C, T) blocks — pins
        the channels-last receiver wiring end to end (the fused-kernel cl
        equality itself is pinned at the demod level by
        test_demod_chain.py::test_block_batch_cl_matches_row_major)."""
        import jax

        from xritdemod_tpu.models.receiver import FusedReceiver

        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        dcfg = DecoderConfig(mode="lrit", frames_per_block=1)
        Cn, T = 2, 1 << 15
        sig, _ = _make_capture(rng, cfg, Cn, frames_per_channel=2)
        nblocks = sig.shape[1] // T

        rx = FusedReceiver(cfg, dcfg, channels=Cn, block_len=T)
        st_r = rx.init_state()
        st_c = rx.init_state()
        for b in range(nblocks):
            x = sig[:, b * T : (b + 1) * T]
            out_r = rx.step(x, st_r)
            out_c = rx.step_cl(np.ascontiguousarray(x.T), st_c)
            *res_r, st_r = out_r
            *res_c, st_c = out_c
            for a, bb in zip(jax.tree.leaves(res_r), jax.tree.leaves(res_c)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
        for a, bb in zip(jax.tree.leaves(st_r), jax.tree.leaves(st_c)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    def test_relocks_after_stream_gap(self, rng):
        """A noise gap mid-capture unlocks the channel; the fused receiver
        re-acquires and recovers the post-gap frames (reference flywheel
        behaviour, newdecoder.cpp:218-237)."""
        from xritdemod_tpu.models.receiver import FusedReceiver

        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        dcfg = DecoderConfig(mode="lrit", frames_per_block=1)
        Cn, T = 1, 1 << 15
        sig, _ = _make_capture(rng, cfg, Cn, frames_per_channel=3)
        gap = (rng.normal(size=(Cn, 3 * (1 << 14)))
               + 1j * rng.normal(size=(Cn, 3 * (1 << 14)))) * 0.02
        sig2, _ = _make_capture(
            np.random.default_rng(777), cfg, Cn, frames_per_channel=3
        )
        full = np.concatenate(
            [sig, gap.astype(np.complex64), sig2], axis=1
        )
        nblocks = full.shape[1] // T

        rx = FusedReceiver(cfg, dcfg, channels=Cn, block_len=T)
        st = rx.init_state()
        got = []
        for b in range(nblocks):
            batch, ok, _, st = rx.step(full[:, b * T : (b + 1) * T], st)
            okh, fok = np.asarray(ok), np.asarray(batch.frame_ok)
            ctr = np.asarray(batch.counter)
            for j in range(rx.k):
                if okh[0, j] and fok[0, j]:
                    got.append(int(ctr[0, j]))
        # Frames from both sides of the gap (counter0=0 for channel 0 in
        # both halves; at least 2 of 3 frames per side survive edges).
        assert len(got) >= 4, got


class TestFoldedFused:
    def test_folded_fused_matches_host_path(self, rng):
        """FoldedCaptureReceiver(use_fused=True) — the on-device bulk
        reprocess — recovers exactly the frames the host-decoder path
        recovers from the same capture."""
        from xritdemod_tpu.models.demodulator import DemodConfig
        from xritdemod_tpu.parallel.timeblocks import FoldedCaptureReceiver

        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        vcdus = tx.make_vcdus(4, scid=13, vcid=11, rng=rng)
        symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
        sig = tx.modulate(symbols, cfg, rng)

        kw = dict(folds=8, block_len=1 << 15, warmup=16384,
                  frames_per_block=2)
        out_f = FoldedCaptureReceiver(cfg, use_fused=True, **kw).process(sig)
        out_h = FoldedCaptureReceiver(cfg, use_fused=False, **kw).process(sig)
        got_f = {(v, c, p) for (_, v, c, p) in out_f}
        got_h = {(v, c, p) for (_, v, c, p) in out_h}
        want = {(11, i, bytes(vcdus[i])) for i in range(len(vcdus))}
        assert got_f == got_h == want


class TestRingBf16:
    def test_bf16_ring_roundtrip(self, rng):
        """bf16 ring storage (the TPU default) round-trips symbols at
        bf16 precision through append+extract."""
        from xritdemod_tpu.ops.ring_pallas import ring_append, ring_extract

        C, L, S, E = 16, 1024, 300, 256
        ring = jnp.zeros((C, L), jnp.bfloat16)
        fill = jnp.zeros((C,), jnp.int32)
        new = rng.normal(size=(C, S)).astype(np.float32)
        n = np.full(C, S, np.int32)
        ring, fill, ovf = ring_append(
            ring, fill, jnp.asarray(new), jnp.asarray(n), interpret=True
        )
        assert ring.dtype == jnp.bfloat16 and not np.asarray(ovf).any()
        ring, fill, out, ok = ring_extract(
            ring, fill, jnp.zeros((C,), jnp.int32), E, interpret=True
        )
        assert np.asarray(ok).all()
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)),
            np.asarray(jnp.asarray(new[:, :E]).astype(jnp.bfloat16)
                       .astype(jnp.float32)),
        )


class TestRxCheckpoint:
    def test_rx_state_roundtrip_and_resume(self, tmp_path, rng):
        """The fused receiver's whole carried state (demod + ring + locks
        + tails) checkpoints and resumes identically (SURVEY.md §5:
        checkpoint/resume as a first-class aux subsystem)."""
        import jax

        from xritdemod_tpu.models.receiver import FusedReceiver
        from xritdemod_tpu.runtime.checkpoint import load_state, save_state

        cfg = DemodConfig.lrit(sample_rate=1_250_000)
        dcfg = DecoderConfig(mode="lrit", frames_per_block=1)
        Cn, T = 2, 1 << 15
        sig, _ = _make_capture(rng, cfg, Cn, frames_per_channel=4)
        rx = FusedReceiver(cfg, dcfg, channels=Cn, block_len=T)
        st = rx.init_state()
        for b in range(2):
            _, _, _, st = rx.step(sig[:, b * T : (b + 1) * T], st)

        path = str(tmp_path / "rx.npz")
        save_state(path, st)
        st2 = load_state(path, rx.init_state())
        for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # Resumed run continues bit-identically.
        x = sig[:, 2 * T : 3 * T]
        b1, ok1, _, _ = rx.step(x, st)
        b2, ok2, _, _ = rx.step(x, st2)
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
        np.testing.assert_array_equal(
            np.asarray(b1.vcdu), np.asarray(b2.vcdu)
        )
