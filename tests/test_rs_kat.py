"""Known-answer tests for the CCSDS RS(255,223) dual-basis codec.

Breaks the self-validation loop flagged by the round-3 review: every prior
RS test round-tripped `ops/reed_solomon.py` against its own encoder
(`rs_encode_np`), so a *consistently* wrong convention (fcr/prim/basis/bit
order) would pass all of them while real GOES frames failed.  This file
pins the byte-level behavior three independent ways:

1. **An independent textbook implementation** (`_gmul`/`_genpoly`/
   `_indep_encode` below): GF(2^8) arithmetic done directly as carry-less
   shift/XOR from the field polynomial — no exp/log tables — and encoding
   as polynomial long division by a generator constructed from the
   standard's published code parameters (poly 0x187, roots
   alpha^(11*112..11*143); CCSDS 131.0-B, cited by the reference via
   libSatHelper at /root/reference/decoder/src/newdecoder.cpp:313-319).
   Shares no code, tables, or helpers with `ops/reed_solomon.py`; the only
   shared inputs are the published spec constants.
2. **Frozen known-answer literals**: parity bytes for fixed data patterns
   are hard-coded hex strings in this file (computed once from the
   independent implementation and frozen), so the ops module and this
   file's math can never drift together.
3. **Mathematical invariants from the standard** that over-determine the
   conventions: the generator polynomial of the symmetric root set
   {beta^112..beta^143} must be palindromic with g(0)=1 (the root set is
   closed under inversion since 255-112=143); the conventional<->dual map
   must be a GF(2)-linear bijection; and the dual map is exactly the
   trace-functional family bit_j(z) = Tr(z * gamma^j) (MSB-first) for the
   geometric sequence gamma = alpha^117 — a wrong or typo'd basis table
   would not be expressible as trace functionals of *any* geometric basis.

Decode verification is independent too: a corrected output is accepted iff
its *independently computed* syndromes are all zero AND it lies within
Hamming distance t=16 of the received word — which uniquely identifies the
true codeword, with no reliance on the decoder under test.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from xritdemod_tpu.ops import reed_solomon as rs

# ---------------------------------------------------------------------------
# Independent textbook implementation (no shared code/tables with ops/)
# ---------------------------------------------------------------------------

_POLY = 0x187  # x^8 + x^7 + x^2 + x + 1 (CCSDS field polynomial)
_FCR = 112
_PRIM = 11
_N, _K, _T = 255, 223, 16

# CCSDS 101.0-B Annex basis images: the dual (Berlekamp) image of the
# conventional basis element alpha^(7-i) is _IMG[i].  These eight bytes are
# published spec constants (the same class of wire/spec fact as the sync
# words) — they are re-typed here, not imported from ops/reed_solomon.py.
_IMG = (0x8D, 0xEF, 0xEC, 0x86, 0xFA, 0x99, 0xAF, 0x7B)


def _gmul(a: int, b: int) -> int:
    """GF(2^8) multiply by carry-less shift/XOR — no tables."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a & 0x100:
            a ^= _POLY
    return r


def _gpow(a: int, n: int) -> int:
    r, base, n = 1, a, n % 255
    while n:
        if n & 1:
            r = _gmul(r, base)
        base = _gmul(base, base)
        n >>= 1
    return r


def _conv_to_dual(z: int) -> int:
    v = 0
    for j in range(8):
        if z & (1 << j):
            v ^= _IMG[7 - j]
    return v


def _dual_to_conv_map() -> dict[int, int]:
    m = {_conv_to_dual(z): z for z in range(256)}
    assert len(m) == 256, "dual map must be a bijection"
    return m


def _genpoly() -> list[int]:
    """Monic generator, conventional basis, g[0]=x^32 coeff ... g[32]=const."""
    g = [1]
    for j in range(32):
        root = _gpow(2, _PRIM * (_FCR + j))
        ng = [0] * (len(g) + 1)
        for d, c in enumerate(g):
            ng[d] ^= _gmul(c, root)
            ng[d + 1] ^= c
        g = ng
    return g[::-1]


def _indep_encode(data_dual: list[int]) -> list[int]:
    """223 wire (dual-basis) bytes -> 255-byte wire codeword.

    Transmit order per CCSDS: data first, first byte = coefficient of
    x^254; parity = remainder of m(x)*x^32 mod g(x), highest power first.
    """
    d2c = _dual_to_conv_map()
    g = _genpoly()
    rem = [d2c[b] for b in data_dual] + [0] * 32
    for i in range(_K):
        coef = rem[i]
        if coef:
            for d in range(1, 33):
                rem[i + d] ^= _gmul(coef, g[d])
            rem[i] = 0
    return list(data_dual) + [_conv_to_dual(p) for p in rem[_K:]]


def _indep_syndromes(cw_dual: list[int]) -> list[int]:
    """Syndromes S_j = c(alpha^(11*(112+j))), conventional-basis math."""
    d2c = _dual_to_conv_map()
    c = [d2c[b] for b in cw_dual]  # c[0] = coeff of x^254
    out = []
    for j in range(32):
        root = _gpow(2, _PRIM * (_FCR + j))
        acc = 0
        for coef in c:  # Horner, highest power first
            acc = _gmul(acc, root) ^ coef
        out.append(acc)
    return out


def _trace(z: int) -> int:
    t, x = 0, z
    for _ in range(8):
        t ^= x
        x = _gmul(x, x)
    return t


# ---------------------------------------------------------------------------
# Frozen known-answer vectors (computed once from the textbook math above
# and hard-coded so implementations cannot drift together)
# ---------------------------------------------------------------------------

_RAMP_DATA = bytes(range(1, 224))
_RAMP_PARITY = bytes.fromhex(
    "91530b14967a1d0eac2b80a08e06d86aaf2fc193edc970bab2fd606781473b90"
)

_RAND_DATA = bytes.fromhex(
    "7df042096413bfdf0d0572d7026418b5cc4a84b94cfb0a709df295ea43c5c420"
    "f4b15766d5220c4d6e1a0ce90bf1cd19aaa392293e291c8698d4a3e42be420a6"
    "746b4fbd72ce736b57d5c574d308664ce714753f8b97015272188153525c6937"
    "b851b1c971d5036da740b93a3869e7418446bc294f0be2f451db29bff0b6d9a0"
    "9bce0f58c8844a7659f94e6f76cd801120e4942662e3810c845c5e151ca49bc6"
    "cdd1f13f257fbabea7ef39940cdf954dedc48b8132c63fdf3e3e39714cd03028"
    "f812aaba2cd3bbd34d34b6d8de06b5788e35f003e898a77f010ecbb26bae04"
)
_RAND_PARITY = bytes.fromhex(
    "9a9ce27a5489a35ccf0ec7649041b76b7697a75bf1731ed0e58b6c30fae77d8b"
)


class TestStandardInvariants:
    def test_genpoly_palindromic_with_unit_constant(self):
        # Root set {beta^112..beta^143} is closed under inversion
        # (255-112=143), so g must be self-reciprocal; the root product is
        # beta^(sum 112..143) = beta^4080 = beta^0 = 1, so g(0)=1.
        g = _genpoly()
        assert g[0] == 1 and g[-1] == 1
        assert g == g[::-1]

    def test_dual_map_is_linear_bijection(self):
        m = [_conv_to_dual(z) for z in range(256)]
        assert len(set(m)) == 256
        for a in (1, 2, 0x53, 0x80, 0xFF):
            for b in (1, 7, 0x91, 0xFE):
                assert m[a ^ b] == m[a] ^ m[b]

    def test_dual_map_is_trace_functional_of_geometric_basis(self):
        # bit_j (MSB-first) of dual(z) == Tr(z * gamma^j), gamma = alpha^117.
        # Derived by solving for the 8 linear functionals of the standard's
        # map and observing they form a geometric sequence; any single-bit
        # typo in the basis images would break this for some z.
        gamma = _gpow(2, 117)
        for z in range(256):
            d = _conv_to_dual(z)
            for j in range(8):
                bit = (d >> (7 - j)) & 1
                assert bit == _trace(_gmul(z, _gpow(gamma, j))), (z, j)

    def test_ops_tables_match_textbook_math(self):
        # The ops module's generated tables must agree with the no-table
        # textbook arithmetic: exp table == alpha powers, genpoly (stored in
        # beta logs, constant-first) == independent genpoly.
        bexp, blog, taltab, tal1tab, g_ops = rs._gf_tables()
        beta = _gpow(2, _PRIM)
        for i in range(255):
            assert int(bexp[i]) == _gpow(beta, i)
        d2c = _dual_to_conv_map()
        for z in range(256):
            assert int(taltab[z]) == _conv_to_dual(z)
            assert int(tal1tab[z]) == d2c[z]
        g_ind = _genpoly()[::-1]  # constant-first, conventional values
        assert [int(v) for v in g_ops] == g_ind


class TestKnownAnswerVectors:
    @pytest.mark.parametrize(
        "data,parity",
        [
            (bytes(223), bytes(32)),  # linearity anchor: 0 -> 0
            (_RAMP_DATA, _RAMP_PARITY),
            (_RAND_DATA, _RAND_PARITY),
        ],
        ids=["zeros", "ramp", "random"],
    )
    def test_frozen_parity(self, data, parity):
        # The textbook encoder reproduces the frozen literal...
        cw = _indep_encode(list(data))
        assert bytes(cw[_K:]) == parity
        # ...and so does the ops encoder, byte for byte.
        ops_cw = rs.rs_encode_np(np.frombuffer(data, np.uint8))
        assert bytes(ops_cw[_K:].tolist()) == parity

    def test_cross_encoder_agreement_random(self):
        rng = np.random.default_rng(7)
        data = rng.integers(0, 256, (8, _K)).astype(np.uint8)
        ops_cw = rs.rs_encode_np(data)
        for r in range(8):
            assert ops_cw[r].tolist() == _indep_encode(data[r].tolist())


class TestIndependentDecodeVerification:
    """Accept a decode iff independent syndromes vanish AND the correction
    stays within distance t of the received word (unique-decoding bound)."""

    def _check(self, received, corrected, nerr):
        assert _indep_syndromes(corrected.tolist()) == [0] * 32
        dist = int(np.sum(received != np.asarray(corrected)))
        assert dist <= _T
        assert nerr == dist

    def test_decode_of_independent_codewords(self):
        rng = np.random.default_rng(11)
        data = rng.integers(0, 256, (4, _K)).astype(np.uint8)
        cws = np.array([_indep_encode(d.tolist()) for d in data], np.uint8)
        bad = cws.copy()
        for r, ne in enumerate([0, 1, 8, 16]):
            pos = rng.choice(_N, size=ne, replace=False)
            for p in pos:
                bad[r, p] ^= rng.integers(1, 256)
        corr, nerr = rs.rs_decode(jnp.asarray(bad))
        corr, nerr = np.asarray(corr), np.asarray(nerr)
        for r, ne in enumerate([0, 1, 8, 16]):
            self._check(bad[r], corr[r], int(nerr[r]))
            assert int(nerr[r]) == ne
            assert corr[r].tolist() == cws[r].tolist()

    def test_decode_failure_beyond_t(self):
        rng = np.random.default_rng(13)
        data = rng.integers(0, 256, _K).astype(np.uint8)
        cw = np.array(_indep_encode(data.tolist()), np.uint8)
        bad = cw.copy()
        pos = rng.choice(_N, size=24, replace=False)  # > t errors
        for p in pos:
            bad[p] ^= rng.integers(1, 256)
        _, nerr = rs.rs_decode(jnp.asarray(bad[None]))
        # 24 random errors either fail (-1) or miscorrect to SOME codeword;
        # with the parity budget here, failure is the overwhelmingly likely
        # outcome and what the reference reports (decode_ccsds -> -1).
        assert int(np.asarray(nerr)[0]) == -1
