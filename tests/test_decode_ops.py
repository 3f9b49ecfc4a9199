"""Golden-vector unit tests for the CADU decode kernels.

The reference has no tests (SURVEY.md §4); validation is self-generated
encode -> impair -> decode round-trips, with conventions pinned to the
published coded-domain unique words (newdecoder.cpp:21-24) and the canonical
CCSDS PN sequence prefix.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from xritdemod_tpu import constants as C
from xritdemod_tpu.ops import (
    conv_code,
    correlator,
    derandomizer,
    nrzm,
    reed_solomon as rs,
    viterbi,
)
from xritdemod_tpu.utils.bits import bits_of_u64


class TestConvCode:
    def test_uw0_lrit(self):
        bits = bits_of_u64(C.SYNC_MARKER, 32)
        enc, _ = conv_code.conv_encode_bits(bits)
        val = int("".join(map(str, enc)), 2)
        assert val == C.LRIT_UW0

    def test_uw0_hrit(self):
        bits = bits_of_u64(C.SYNC_MARKER, 32)
        pre, _ = conv_code.nrzm_encode_bits(bits, prev=0)
        enc, _ = conv_code.conv_encode_bits(pre)
        val = int("".join(map(str, enc)), 2)
        assert val == C.HRIT_UW0

    def test_lrit_uw2_is_complement(self):
        assert C.LRIT_UW2 == C.LRIT_UW0 ^ 0xFFFFFFFFFFFFFFFF

    def test_sr_chaining(self):
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2, 64).astype(np.uint8)
        whole, _ = conv_code.conv_encode_bits(bits)
        a, sr = conv_code.conv_encode_bits(bits[:40])
        b, _ = conv_code.conv_encode_bits(bits[40:], sr)
        assert np.array_equal(whole, np.concatenate([a, b]))


class TestCorrelator:
    def test_finds_embedded_word(self, rng):
        soft = rng.normal(0, 40, 4096).astype(np.float32)
        signs = 1.0 - 2.0 * bits_of_u64(C.LRIT_UW0).astype(np.float32)
        soft[777 : 777 + 64] = signs * 100
        tmpl = correlator.make_templates([C.LRIT_UW0, C.LRIT_UW2])
        corr, word, pos = correlator.best_correlation(
            correlator.correlate(jnp.asarray(soft), tmpl)
        )
        assert int(corr) == 64 and int(word) == 0 and int(pos) == 777

    def test_finds_flipped_word(self, rng):
        soft = rng.normal(0, 40, 4096).astype(np.float32)
        signs = 1.0 - 2.0 * bits_of_u64(C.LRIT_UW2).astype(np.float32)
        soft[100 : 164] = signs * 100
        tmpl = correlator.make_templates([C.LRIT_UW0, C.LRIT_UW2])
        corr, word, pos = correlator.best_correlation(
            correlator.correlate(jnp.asarray(soft), tmpl)
        )
        assert int(word) == 1 and int(pos) == 100

    def test_correlate_at(self, rng):
        soft = rng.normal(0, 40, 1024).astype(np.float32)
        signs = 1.0 - 2.0 * bits_of_u64(C.HRIT_UW0).astype(np.float32)
        soft[512 : 576] = signs * 100
        tmpl = correlator.make_templates([C.HRIT_UW0, C.HRIT_UW2])
        corr, word = correlator.correlate_at(
            jnp.asarray(soft), tmpl, jnp.asarray([512, 0])
        )
        assert int(corr[0]) == 64 and int(word[0]) == 0
        assert int(corr[1]) < 50  # noise floor

    def test_phase_fix(self):
        soft = jnp.asarray([1.0, -2.0, 3.0])
        assert np.array_equal(
            np.asarray(correlator.phase_fix(soft, jnp.int32(1))), [-1.0, 2.0, -3.0]
        )
        assert np.array_equal(
            np.asarray(correlator.phase_fix(soft, jnp.int32(0))), [1.0, -2.0, 3.0]
        )


class TestDerandomizer:
    def test_canonical_prefix(self):
        pn = np.asarray(derandomizer.pn_sequence(8))
        assert list(pn) == [0xFF, 0x48, 0x0E, 0xC0, 0x9A, 0x0D, 0x70, 0xBC]

    def test_involution(self, rng):
        data = rng.integers(0, 256, (3, 1020)).astype(np.uint8)
        out = derandomizer.derandomize(derandomizer.derandomize(jnp.asarray(data)))
        assert np.array_equal(np.asarray(out), data)


class TestNrzm:
    def test_roundtrip(self, rng):
        data = rng.integers(0, 256, (2, 32)).astype(np.uint8)
        enc = nrzm.nrzm_encode_bytes(data, 0)
        dec = np.asarray(nrzm.nrzm_decode_bytes(jnp.asarray(enc), 0))
        assert np.array_equal(dec, data)

    def test_prev_bit_carries(self, rng):
        data = rng.integers(0, 256, 16).astype(np.uint8)
        enc = nrzm.nrzm_encode_bytes(data[None], 1)[0]
        dec = np.asarray(nrzm.nrzm_decode_bytes(jnp.asarray(enc[None]), 1))[0]
        assert np.array_equal(dec, data)


class TestViterbi:
    def test_clean_roundtrip(self, rng):
        B, T = 2, 256
        msg = rng.integers(0, 2, (B, T)).astype(np.uint8)
        coded = np.stack([conv_code.conv_encode_bits(m)[0] for m in msg])
        soft = (1.0 - 2.0 * coded.astype(np.float32)) * 127
        bits, errs = viterbi.viterbi_decode(jnp.asarray(soft))
        assert np.array_equal(np.asarray(bits), msg)
        assert np.all(np.asarray(errs) == 0)

    def test_noisy_roundtrip(self, rng):
        B, T = 4, 1032
        msg = rng.integers(0, 2, (B, T)).astype(np.uint8)
        coded = np.stack([conv_code.conv_encode_bits(m)[0] for m in msg])
        soft = (1.0 - 2.0 * coded.astype(np.float32)) * 100
        soft = soft + rng.normal(0, 45, soft.shape).astype(np.float32)
        bits, errs = viterbi.viterbi_decode(jnp.asarray(soft))
        # Edge bits near the traceback start can flip; the frame pipeline
        # discards the first 32 decoded bits anyway (newdecoder.cpp:295-301).
        assert np.array_equal(np.asarray(bits)[:, 8:], msg[:, 8:])
        errs = np.asarray(errs)
        assert np.all(errs > 0) and np.all(errs < T // 4)

    def test_hard_bit_flips(self, rng):
        B, T = 2, 512
        msg = rng.integers(0, 2, (B, T)).astype(np.uint8)
        coded = np.stack([conv_code.conv_encode_bits(m)[0] for m in msg])
        soft = (1.0 - 2.0 * coded.astype(np.float32)) * 127
        # flip 3% of coded symbols outright
        for b in range(B):
            idx = rng.choice(2 * T, int(0.03 * 2 * T), replace=False)
            soft[b, idx] = -soft[b, idx]
        bits, errs = viterbi.viterbi_decode(jnp.asarray(soft))
        assert np.array_equal(np.asarray(bits)[:, 8:], msg[:, 8:])

    def test_reencode_matches_host_encoder(self, rng):
        msg = rng.integers(0, 2, (1, 128)).astype(np.uint8)
        coded = conv_code.conv_encode_bits(msg[0])[0]
        re = np.asarray(viterbi.reencode_bits(jnp.asarray(msg)))[0]
        assert np.array_equal(re, coded)


class TestReedSolomon:
    def test_clean(self, rng):
        data = rng.integers(0, 256, (2, 223)).astype(np.uint8)
        cw = rs.rs_encode_np(data)
        corr, nerr = rs.rs_decode(jnp.asarray(cw))
        assert np.all(np.asarray(nerr) == 0)
        assert np.array_equal(np.asarray(corr), cw)

    @pytest.mark.parametrize("nerrs", [1, 8, 16])
    def test_corrects_up_to_t(self, rng, nerrs):
        data = rng.integers(0, 256, (3, 223)).astype(np.uint8)
        cw = rs.rs_encode_np(data)
        bad = cw.copy()
        for b in range(3):
            pos = rng.choice(255, nerrs, replace=False)
            bad[b, pos] ^= rng.integers(1, 256, nerrs).astype(np.uint8)
        corr, nerr = rs.rs_decode(jnp.asarray(bad))
        assert np.all(np.asarray(nerr) == nerrs)
        assert np.array_equal(np.asarray(corr), cw)

    def test_detects_beyond_t(self, rng):
        data = rng.integers(0, 256, (1, 223)).astype(np.uint8)
        cw = rs.rs_encode_np(data)
        bad = cw.copy()
        pos = rng.choice(255, 24, replace=False)
        bad[0, pos] ^= rng.integers(1, 256, 24).astype(np.uint8)
        _, nerr = rs.rs_decode(jnp.asarray(bad))
        assert int(nerr[0]) == -1

    def test_frame_interleave(self, rng):
        data = rng.integers(0, 256, (2, 4, 223)).astype(np.uint8)
        cw = rs.rs_encode_np(data)                      # (2, 4, 255)
        frames = np.asarray(rs.interleave(jnp.asarray(cw)))
        # corrupt a burst: 20 consecutive bytes spread over the 4 blocks
        bad = frames.copy()
        bad[0, 100:120] ^= 0x5A
        corr, nerr = rs.rs_decode_frame(jnp.asarray(bad))
        assert np.array_equal(np.asarray(corr), frames)
        assert np.all(np.asarray(nerr)[0] == 5)         # 20/4 per block
        assert np.all(np.asarray(nerr)[1] == 0)

    def test_dual_basis_bijection(self):
        ident = np.arange(256, dtype=np.uint8)
        back = np.asarray(rs.to_dual(rs.to_conventional(jnp.asarray(ident))))
        assert np.array_equal(back, ident)

    @pytest.mark.heavy
    def test_sparse_error_path_bit_identical(self, rng):
        """The sparse-error compaction path (rs_decode sparse_max) must be
        bit-identical to the full errored path in all three regimes:
        sparse (0 < K <= Kmax, incl. failures beyond t), heavy fallback
        (K > Kmax), and clean (K = 0)."""
        B = 2048
        data = rng.integers(0, 256, (B, 223)).astype(np.uint8)
        cw = rs.rs_encode_np(data)

        # sparse: ~1% errored rows, incl. one uncorrectable (> t errors)
        bad = cw.copy()
        err_rows = rng.choice(B, size=B // 100, replace=False)
        for i in err_rows[:-1]:
            pos = rng.choice(255, int(rng.integers(1, 17)), replace=False)
            bad[i, pos] ^= rng.integers(1, 256, len(pos)).astype(np.uint8)
        pos = rng.choice(255, 24, replace=False)
        bad[err_rows[-1], pos] ^= rng.integers(1, 256, 24).astype(np.uint8)
        c_full, n_full = rs.rs_decode(jnp.asarray(bad), sparse_max=0)
        c_sp, n_sp = rs.rs_decode(jnp.asarray(bad))     # auto Kmax = 128
        assert np.array_equal(np.asarray(c_full), np.asarray(c_sp))
        assert np.array_equal(np.asarray(n_full), np.asarray(n_sp))
        assert int(np.asarray(n_sp)[err_rows[-1]]) == -1

        # heavy: K > Kmax falls back to the full path
        bad2 = cw.copy()
        bad2[: B // 2, 7] ^= 0x3C
        c2f, n2f = rs.rs_decode(jnp.asarray(bad2), sparse_max=0)
        c2s, n2s = rs.rs_decode(jnp.asarray(bad2))
        assert np.array_equal(np.asarray(c2f), np.asarray(c2s))
        assert np.array_equal(np.asarray(n2f), np.asarray(n2s))

        # clean: zero-syndrome fast path unchanged
        c3, n3 = rs.rs_decode(jnp.asarray(cw))
        assert np.array_equal(np.asarray(c3), cw)
        assert not np.asarray(n3).any()


class TestViterbiPallas:
    def test_matches_xla_bit_exact(self, rng):
        """Pallas Viterbi (interpret) == XLA Viterbi, bits and errors."""
        import jax.numpy as jnp

        from xritdemod_tpu.ops import viterbi as vit
        from xritdemod_tpu.ops.viterbi_pallas import viterbi_decode_pallas

        B, T = 8, 128
        bits = rng.integers(0, 2, (B, T)).astype(np.uint8)
        coded = np.asarray(vit.reencode_bits(jnp.asarray(bits)))
        soft = (1.0 - 2.0 * coded.astype(np.float32)) * 64 + rng.normal(
            0, 12, (B, 2 * T)
        ).astype(np.float32)
        b1, e1 = vit.viterbi_decode(jnp.asarray(soft))
        b2, e2 = viterbi_decode_pallas(jnp.asarray(soft), interpret=True)
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    def test_segmented_matches_exact(self, rng):
        """Segment-parallel Viterbi == exact decoder on noisy frames.

        overlap=128 (~21 constraint lengths of warmup/tail per window) makes
        the windowed survivor paths merge with the exact ones at any
        realistic SNR; this pins bit- and error-count equality.
        """
        import jax.numpy as jnp

        from xritdemod_tpu.ops import viterbi as vit
        from xritdemod_tpu.ops.viterbi_pallas import viterbi_decode_segmented

        B, T = 2, 1028  # T not divisible by segments exercises tail padding
        bits = rng.integers(0, 2, (B, T)).astype(np.uint8)
        coded = np.asarray(vit.reencode_bits(jnp.asarray(bits)))
        soft = (1.0 - 2.0 * coded.astype(np.float32)) * 64 + rng.normal(
            0, 24, (B, 2 * T)
        ).astype(np.float32)
        b1, e1 = vit.viterbi_decode(jnp.asarray(soft))
        b2, e2 = viterbi_decode_segmented(
            jnp.asarray(soft), segments=4, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


class TestDecodeMulti:
    def test_multi_matches_sequential_decode_frames(self, rng):
        """decode_multi (B, F, 16384) == F sequential decode_frames calls
        with chained tails, field for field."""
        import jax.numpy as jnp

        from xritdemod_tpu import tx
        from xritdemod_tpu.models.decoder import CaduDecoder, DecoderConfig

        B, F = 3, 2
        dec = CaduDecoder(DecoderConfig(mode="lrit"))
        frames = np.stack([
            tx.encode_stream(
                tx.make_vcdus(F, vcid=b + 1, rng=np.random.default_rng(b)),
                lrit=True, amp=0.9, noise=0.1,
                rng=np.random.default_rng(10 + b),
            ).reshape(F, 16384)
            for b in range(B)
        ])                                                  # (B, F, 16384)
        tails0 = jnp.zeros((B, 64), jnp.float32)

        mb, mt = dec._decode_multi(jnp.asarray(frames), tails0)

        tails = tails0
        seq = []
        for f in range(F):
            b1, tails = dec._decode_frames(jnp.asarray(frames[:, f]), tails)
            seq.append(b1)
        for name in mb._fields:
            if getattr(mb, name) is None:     # forensics off -> None
                continue
            got = np.asarray(getattr(mb, name))
            want = np.stack(
                [np.asarray(getattr(b1, name)) for b1 in seq], axis=1
            )
            np.testing.assert_array_equal(got, want, err_msg=name)
        np.testing.assert_array_equal(np.asarray(mt[:, -1]), np.asarray(tails))
        assert np.asarray(mb.frame_ok).all()


class TestSegmentedMargin:
    def test_overlap_margin_mechanism(self, rng):
        """Pins the segmented-Viterbi warmup behaviour at the edge
        (docs/VITERBI_MARGIN.md): at low SNR a tiny overlap visibly
        diverges from the exact decoder, while the default overlap=128
        stays bit-identical on the same data."""
        import jax.numpy as jnp

        from xritdemod_tpu.ops import conv_code
        from xritdemod_tpu.ops.viterbi import viterbi_decode
        from xritdemod_tpu.ops.viterbi_pallas import viterbi_decode_segmented

        B, T = 8, 1024
        bits = rng.integers(0, 2, (B, T)).astype(np.uint8)
        soft = np.stack([
            1.0 - 2.0 * conv_code.conv_encode_bits(bits[b])[0]
            for b in range(B)
        ]).astype(np.float32)                      # coded bit 1 -> negative
        # 0 dB Es/N0: well below nominal operation but above the
        # divergence onset for overlap=128.
        soft = soft + rng.normal(0, 0.707, soft.shape).astype(np.float32)

        exact, _ = viterbi_decode(jnp.asarray(soft))
        tiny, _ = viterbi_decode_segmented(
            jnp.asarray(soft), segments=8, overlap=8, interpret=True
        )
        full, _ = viterbi_decode_segmented(
            jnp.asarray(soft), segments=8, overlap=128, interpret=True
        )
        n_tiny = int((np.asarray(tiny) != np.asarray(exact)).sum())
        n_full = int((np.asarray(full) != np.asarray(exact)).sum())
        assert n_tiny > 0, "overlap=8 should diverge at 0 dB"
        assert n_full == 0, f"overlap=128 diverged ({n_full} bits)"
