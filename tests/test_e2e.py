"""End-to-end receive tests: TX frames -> impairments -> decode -> bit-exact.

This is milestone B from SURVEY.md §7: the self-validating replacement for
the reference's live-downlink operational testing.  The TX fixture
(xritdemod_tpu/tx.py) builds real CADU coded streams; the decoder must
return bit-exact VCDU payloads through noise, polarity flips, unaligned
stream starts, and both LRIT/HRIT modes.
"""

import numpy as np
import pytest

# Compile-heavy on XLA:CPU -- excluded from the quick tier (build.sh).
pytestmark = pytest.mark.heavy

from xritdemod_tpu import tx
from xritdemod_tpu import constants as C
from xritdemod_tpu.models.decoder import CaduDecoder, DecoderConfig, StreamDecoder


def collect(batches):
    ok = np.concatenate([np.asarray(b.frame_ok) for b in batches])
    vcdu = np.concatenate([np.asarray(b.vcdu) for b in batches])[ok]
    ctr = np.concatenate([np.asarray(b.counter) for b in batches])[ok]
    scid = np.concatenate([np.asarray(b.scid) for b in batches])[ok]
    vcid = np.concatenate([np.asarray(b.vcid) for b in batches])[ok]
    return vcdu, ctr, scid, vcid


@pytest.mark.parametrize("mode,phase180", [("lrit", False), ("lrit", True), ("hrit", False)])
def test_stream_decode_bit_exact(rng, mode, phase180):
    n = 9
    vcdus = tx.make_vcdus(n, scid=13, vcid=5, counter0=77, rng=rng)
    soft = tx.encode_stream(
        vcdus,
        lrit=(mode == "lrit"),
        amp=0.6,
        noise=0.15,
        phase180=phase180,
        lead=3000,
        rng=rng,
    )
    wire = tx.soft_to_int8(soft)  # int8 wire format, like TCP :5000
    dec = StreamDecoder(DecoderConfig(mode=mode, frames_per_block=4))
    batches = dec.push(wire.astype(np.float32))
    vcdu, ctr, scid, vcid = collect(batches)
    # acquisition decodes frame 0 alone (B=1), then batches of 4 -> 9 total
    assert len(vcdu) == 9
    assert np.array_equal(vcdu, vcdus)
    assert np.array_equal(ctr, 77 + np.arange(9))
    assert set(scid) == {13} and set(vcid) == {5}
    assert dec.stats.frames == 9 and dec.stats.dropped == 0


def test_stream_decode_incremental_push(rng):
    """Symbols arriving in odd-sized chunks decode identically."""
    vcdus = tx.make_vcdus(5, rng=rng)
    soft = tx.encode_stream(vcdus, amp=0.8, noise=0.1, lead=1111, rng=rng)
    dec = StreamDecoder(DecoderConfig(frames_per_block=4))
    batches = []
    for i in range(0, len(soft), 7777):
        batches += dec.push(soft[i : i + 7777])
    batches += dec.flush()
    vcdu, ctr, _, _ = collect(batches)
    assert len(vcdu) == 5
    assert np.array_equal(vcdu, vcdus)


def test_byte_errors_corrected_and_counted(rng):
    """Injected hard symbol flips are fixed by Viterbi/RS and show up in
    the statistics counters (newdecoder.cpp:309-319 semantics)."""
    vcdus = tx.make_vcdus(4, rng=rng)
    soft = tx.encode_stream(vcdus, amp=1.0, noise=0.0, rng=rng)
    # flip 1% of coded symbols in frame 2
    idx = rng.choice(C.CODED_FRAME_SIZE, 160, replace=False) + 2 * C.CODED_FRAME_SIZE
    soft[idx] = -soft[idx]
    dec = StreamDecoder(DecoderConfig(frames_per_block=4))
    batches = dec.push(soft) + dec.flush()
    ok = np.concatenate([np.asarray(b.frame_ok) for b in batches])
    vcdu = np.concatenate([np.asarray(b.vcdu) for b in batches])
    vit = np.concatenate([np.asarray(b.vit_errors) for b in batches])
    assert ok.all()
    assert np.array_equal(vcdu, vcdus)
    assert vit[2] > 100  # the impaired frame shows corrected bits
    assert vit[1] < 20


def test_uncorrectable_frame_dropped(rng):
    """A destroyed frame is dropped (all four RS blocks fail) while its
    neighbours still decode (newdecoder.cpp:321-330)."""
    vcdus = tx.make_vcdus(4, rng=rng)
    soft = tx.encode_stream(vcdus, amp=1.0, noise=0.0, rng=rng)
    sl = slice(2 * C.CODED_FRAME_SIZE + 2000, 2 * C.CODED_FRAME_SIZE + 15000)
    soft[sl] = rng.normal(0, 1.0, sl.stop - sl.start).astype(np.float32)
    dec = StreamDecoder(DecoderConfig(frames_per_block=4))
    batches = dec.push(soft) + dec.flush()
    ok = np.concatenate([np.asarray(b.frame_ok) for b in batches])
    rse = np.concatenate([np.asarray(b.rs_errors) for b in batches])
    vcdu = np.concatenate([np.asarray(b.vcdu) for b in batches])
    assert list(ok) == [True, True, False, True]
    assert np.all(rse[2] == -1)
    assert np.array_equal(vcdu[ok], vcdus[[0, 1, 3]])


def test_sync_word_readout(rng):
    vcdus = tx.make_vcdus(4, rng=rng)
    soft = tx.encode_stream(vcdus, amp=1.0, noise=0.0, rng=rng)
    dec = StreamDecoder(DecoderConfig(frames_per_block=4))
    batches = dec.push(soft) + dec.flush()
    sw = np.concatenate([np.asarray(b.sync_word) for b in batches])
    expect = [(C.SYNC_MARKER >> s) & 0xFF for s in (24, 16, 8, 0)]
    # frame 0's history is neutral so its first decoded bits are unreliable;
    # frames 1+ must show the exact attached sync marker.
    assert np.array_equal(sw[1:], np.tile(expect, (len(sw) - 1, 1)))


def test_decoder_batch_api(rng):
    """CaduDecoder.decode_block on pre-aligned symbols (no stream wrapper)."""
    vcdus = tx.make_vcdus(2, rng=rng)
    soft = tx.encode_stream(vcdus, amp=0.7, noise=0.12, rng=rng)
    dec = CaduDecoder(DecoderConfig(frames_per_block=2))
    batch, tail = dec.decode_block(soft, dec.init_tail())
    assert np.asarray(batch.frame_ok).all()
    assert np.array_equal(np.asarray(batch.vcdu), vcdus)
    assert np.asarray(tail).shape == (64,)


class TestDecimationChain:
    """The reference's default real-SDR configs decimate before the demod
    circuit (demodulator.cpp:136-140: 2.5-3 Msps in, ~1.25 Msps circuit).
    End-to-end at 2.5 Msps -> decimation 2 -> LRIT chain -> bit-exact
    frames."""

    def test_decim2_capture_decodes_bit_exact(self, rng):
        from xritdemod_tpu import tx
        from xritdemod_tpu.models.decoder import DecoderConfig, StreamDecoder
        from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator

        # Synthesize at the RAW 2.5 Msps rate (a decimation-1 config gives
        # tx.modulate the right circuit rate), receive with decimation=2.
        cfg_tx = DemodConfig.lrit(sample_rate=2_500_000, decimation=1)
        cfg_rx = DemodConfig.lrit(sample_rate=2_500_000, decimation=2)
        assert abs(cfg_rx.sps - 1_250_000 / 293_883) < 1e-9

        vcdus = tx.make_vcdus(4, scid=13, vcid=7, rng=rng)
        symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
        sig = tx.modulate(symbols, cfg_tx, rng, freq_offset=5e-5)

        T = 1 << 15
        demod = Demodulator(cfg_rx, block_len=T)
        st = demod.init_state()
        dec = StreamDecoder(DecoderConfig(mode="lrit", frames_per_block=1))
        got = []
        for b in range(len(sig) // T):
            soft, valid, st = demod.process(sig[b * T : (b + 1) * T], st)
            for batch in dec.push(np.asarray(soft)[np.asarray(valid)]):
                ok = np.asarray(batch.frame_ok)
                vc = np.asarray(batch.vcdu)
                for i in np.flatnonzero(ok):
                    got.append(bytes(vc[i]))
        want = {bytes(v) for v in vcdus}
        assert len(got) >= len(vcdus) - 1, (len(got), len(vcdus))
        assert set(got) <= want
        assert len(set(got)) >= len(vcdus) - 1

    def test_folded_capture_decim2(self, rng):
        """FoldedCaptureReceiver at decimation=2 recovers every frame
        (the r1 NotImplementedError is gone)."""
        from xritdemod_tpu import tx
        from xritdemod_tpu.models.demodulator import DemodConfig
        from xritdemod_tpu.parallel.timeblocks import FoldedCaptureReceiver

        cfg_tx = DemodConfig.lrit(sample_rate=2_500_000, decimation=1)
        cfg_rx = DemodConfig.lrit(sample_rate=2_500_000, decimation=2)
        vcdus = tx.make_vcdus(6, scid=13, vcid=9, rng=rng)
        symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
        sig = tx.modulate(symbols, cfg_tx, rng)

        rx = FoldedCaptureReceiver(
            cfg_rx, folds=2, block_len=1 << 15, warmup=16384,
            frames_per_block=2,
        )
        out = rx.process(sig)
        got = {v for (_, _, _, v) in out}
        want = {bytes(v) for v in vcdus}
        missing = want - got
        assert len(missing) <= 1, f"{len(missing)} frames lost"
        assert not (got - want)
