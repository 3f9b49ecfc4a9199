"""CCSDS Reed-Solomon (255,223) dual-basis codec, batched for TPU.

TPU-native replacement for SatHelper `ReedSolomon` as driven at
/root/reference/decoder/src/newdecoder.cpp:313-319: the reference
deinterleaves each 1020-byte frame into 4 codewords and decodes them one at
a time on the CPU.  Here all four interleaved blocks of a whole *batch* of
frames decode together: GF(2^8) arithmetic is log/exp table gathers on int32
lanes, Berlekamp-Massey runs a fixed 32 iterations with masked updates (no
data-dependent control flow), and the Chien search / Forney evaluation are
dense (B, 255, 33) einsum-shaped gather+XOR sweeps on the VPU.

Code parameters (CCSDS 131.0-B / constants.py:108-114): field polynomial
x^8+x^7+x^2+x+1 (0x187), generator roots alpha^(11*112)..alpha^(11*143)
(fcr=112, prim=11).  Working base beta = alpha^11 (primitive, as
gcd(11,255)=1) absorbs `prim` so the code becomes a conventional fcr=112
RS code in beta-logs.  Symbols travel in the Berlekamp *dual basis*; the
conversion tables are generated from the standard's basis images
(tal[] below, CCSDS 101.0-B-6 Annex; also used by libcorrect/Karn-style
implementations the reference links).

Returns per-codeword corrected-symbol counts with -1 marking decode failure,
matching `ReedSolomon::decode_ccsds`, and corrected output including parity
(`SetCopyParityToOutput(true)`, newdecoder.cpp:131).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu import constants as C

__all__ = [
    "deinterleave",
    "interleave",
    "rs_decode",
    "rs_decode_frame",
    "rs_encode_np",
    "to_conventional",
    "to_dual",
]

_N = C.RS_N            # 255
_K = C.RS_K            # 223
_T2 = _N - _K          # 32 parity symbols
_NPOLY = _T2 + 1       # error-locator capacity (deg <= 32)
_FCR = C.RS_FCR        # 112
_PRIM = C.RS_PRIM      # 11

# Dual (Berlekamp) basis images of the conventional basis elements; bit j of
# a conventional byte contributes tal[7-j].  Values are the CCSDS standard's.
_TAL = np.array([0x8D, 0xEF, 0xEC, 0x86, 0xFA, 0x99, 0xAF, 0x7B], np.uint8)


@functools.lru_cache(maxsize=None)
def _gf_tables():
    """(bexp, blog, taltab, tal1tab, genpoly) numpy tables, beta = alpha^11."""
    # alpha-representation exp/log for poly 0x187, generator alpha = 2.
    aexp = np.zeros(255, np.int32)
    x = 1
    for i in range(255):
        aexp[i] = x
        x <<= 1
        if x & 0x100:
            x ^= C.RS_GF_POLY
    # beta = alpha^prim tables (double length to skip mod in gathers).
    bexp = np.zeros(512, np.int32)
    for i in range(255):
        bexp[i] = aexp[(i * _PRIM) % 255]
        bexp[i + 255] = bexp[i]
    blog = np.zeros(256, np.int32)
    for i in range(255):
        blog[bexp[i]] = i
    blog[0] = 0  # callers must mask zero operands

    taltab = np.zeros(256, np.uint8)
    for i in range(256):
        v = 0
        for j in range(8):
            if i & (1 << j):
                v ^= _TAL[7 - j]
        taltab[i] = v
    tal1tab = np.zeros(256, np.uint8)
    tal1tab[taltab] = np.arange(256, dtype=np.uint8)
    assert len(set(taltab.tolist())) == 256, "dual-basis map must be bijective"

    # Generator polynomial in beta logs: g(x) = prod_{j}(x - beta^(FCR+j)).
    def mul(a, b):
        if a == 0 or b == 0:
            return 0
        return int(bexp[blog[a] + blog[b]])

    g = np.zeros(_T2 + 1, np.int32)
    g[0] = 1
    for j in range(_T2):
        root = int(bexp[_FCR + j])
        ng = np.zeros_like(g)
        for d in range(j + 1, -1, -1):
            ng[d] = (g[d - 1] if d > 0 else 0) ^ mul(g[d], root)
        g = ng
    return bexp, blog, taltab, tal1tab, g


@functools.lru_cache(maxsize=None)
def _jax_tables():
    # Plain numpy: jit traces close over these as constants (never cache
    # device arrays created inside a trace — they would be tracers).
    bexp, blog, taltab, tal1tab, _ = _gf_tables()
    return bexp, blog, taltab.astype(np.int32), tal1tab.astype(np.int32)


# --------------------------------------------------------------------------
# GF helpers (device, int32 lanes)
# --------------------------------------------------------------------------

def _gfmul(a, b, bexp, blog):
    prod = bexp[blog[a] + blog[b]]
    return jnp.where((a == 0) | (b == 0), 0, prod)


def _gfmul_bits(a: jax.Array, b: jax.Array) -> jax.Array:
    """Gather-free GF(2^8) multiply (poly 0x187), elementwise int32.

    Carry-less product via 8 shift+select+XOR partials, then 7 conditional
    XOR reduction steps — pure VPU integer ops, no table gathers (gathers
    serialize on TPU and were the RS decoder's bottleneck)."""
    acc = jnp.zeros_like(a)
    for i in range(8):
        acc = acc ^ jnp.where((b >> i) & 1 != 0, a << i, 0)
    for j in range(14, 7, -1):
        acc = acc ^ jnp.where(
            (acc >> j) & 1 != 0, np.int32(C.RS_GF_POLY << (j - 8)), 0
        )
    return acc


@functools.lru_cache(maxsize=None)
def _sq_table() -> tuple:
    """GF squares of the 8 basis bits (squaring is GF(2)-linear)."""
    bexp, blog, *_ = _gf_tables()

    def mul(a, b):
        if a == 0 or b == 0:
            return 0
        return int(bexp[(blog[a] + blog[b]) % 255])

    return tuple(mul(1 << j, 1 << j) for j in range(8))


def _gfsq_bits(a: jax.Array) -> jax.Array:
    """GF square via the linear basis map: XOR of SQ[j] over set bits."""
    sq = _sq_table()
    acc = jnp.zeros_like(a)
    for j in range(8):
        acc = acc ^ jnp.where((a >> j) & 1 != 0, np.int32(sq[j]), 0)
    return acc


def _gfinv_bits(a: jax.Array) -> jax.Array:
    """GF inverse a^254 = a^2 * a^4 * ... * a^128 (0 -> 0)."""
    s = _gfsq_bits(a)          # a^2
    r = s
    for _ in range(6):
        s = _gfsq_bits(s)      # a^4 .. a^128
        r = _gfmul_bits(r, s)
    return r


def _bitlinear_bytes(x: jax.Array, images: tuple) -> jax.Array:
    """Apply a GF(2)-linear byte map given its 8 basis images."""
    acc = jnp.zeros_like(x)
    for j in range(8):
        acc = acc ^ jnp.where((x >> j) & 1 != 0, np.int32(images[j]), 0)
    return acc


def _bytes_to_bits_f32(x: jax.Array) -> jax.Array:
    """(..., n) int32 bytes -> (..., 8n) float32 bits (bit j of byte i at
    column 8i+j)."""
    bits = jnp.stack([(x >> j) & 1 for j in range(8)], axis=-1)
    return bits.reshape(x.shape[:-1] + (x.shape[-1] * 8,)).astype(jnp.float32)


def _parity_bits_to_bytes(y: jax.Array) -> jax.Array:
    """f32 counts (..., 8n) -> int32 bytes: byte i = sum_j (count mod 2)<<j.

    Counts are exact in f32 (<= 2040 < 2^24)."""
    b = (y.astype(jnp.int32) & 1).reshape(y.shape[:-1] + (-1, 8))
    acc = b[..., 0]
    for j in range(1, 8):
        acc = acc | (b[..., j] << j)
    return acc


def _xor_reduce(x, axis):
    return jax.lax.reduce(x, np.int32(0), jax.lax.bitwise_xor, (axis,))


def to_conventional(data: jax.Array) -> jax.Array:
    tal1 = jnp.asarray(_jax_tables()[3])
    return tal1[data.astype(jnp.int32)]


def to_dual(data: jax.Array) -> jax.Array:
    tal = jnp.asarray(_jax_tables()[2])
    return tal[data.astype(jnp.int32)]


# --------------------------------------------------------------------------
# Interleaving (newdecoder.cpp:315-318 semantics: block i = bytes i::4)
# --------------------------------------------------------------------------

def deinterleave(frame: jax.Array, nblocks: int = C.RS_BLOCKS) -> jax.Array:
    """`(..., nblocks*255)` -> `(..., nblocks, 255)`."""
    lead = frame.shape[:-1]
    return jnp.swapaxes(frame.reshape(lead + (_N, nblocks)), -1, -2)


def interleave(blocks: jax.Array) -> jax.Array:
    """`(..., nblocks, 255)` -> `(..., nblocks*255)`."""
    lead = blocks.shape[:-2]
    nblocks = blocks.shape[-2]
    return jnp.swapaxes(blocks, -1, -2).reshape(lead + (nblocks * _N,))


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _power_matrices():
    """Static exponent matrices for syndrome/Chien sweeps (numpy int32)."""
    i = np.arange(_N)
    k = np.arange(_T2)
    # Syndrome: S_k = XOR_i c_i * beta^((FCR+k)*(254-i))
    syn_pw = ((_FCR + k)[:, None] * (254 - i)[None, :]) % 255       # (32, 255)
    p = np.arange(_N)
    kk = np.arange(_NPOLY)
    chien_pw = ((255 - p)[:, None] * kk[None, :]) % 255              # (255, 33)
    return syn_pw.astype(np.int32), chien_pw.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _basis_images():
    """(conv_images, dual_images): per-bit images of the basis maps."""
    _, _, taltab, tal1tab, _ = _gf_tables()
    conv = tuple(int(tal1tab[1 << j]) for j in range(8))
    dual = tuple(int(taltab[1 << j]) for j in range(8))
    return conv, dual


@functools.lru_cache(maxsize=None)
def _bit_matrices():
    """GF(2) bit matrices (numpy f32 0/1) for the linear sweeps.

    Every multiply-by-constant in GF(2^8) is linear over GF(2), so the
    syndrome computation, Chien search, and the two Forney evaluations are
    bit-linear maps.  Expressed as 0/1 matrices they run as ONE (exact)
    MXU matmul each — counts < 2^24 are exact even through the bf16
    multiply path — followed by a mod-2.  This replaces the (B, 32, 255)
    exp/log gather sweeps that serialized on TPU.
    """
    bexp, blog, taltab, tal1tab, _ = _gf_tables()
    syn_pw, chien_pw = _power_matrices()
    bexp = bexp.astype(np.int64)
    blog = blog.astype(np.int64)

    def gmul_vec(a, b):
        a = np.asarray(a, np.int64)
        b = np.asarray(b, np.int64)
        out = bexp[(blog[a] + blog[b]) % 255]
        return np.where((a == 0) | (b == 0), 0, out)

    def bits_of(c):
        return ((c[..., None] >> np.arange(8)) & 1).astype(np.float32)

    units = (1 << np.arange(8)).astype(np.int64)

    # Syndromes, dual->conventional absorbed: the received byte r_i is
    # dual-basis; conventional image of its bit j is tal1tab[1<<j].
    U = tal1tab[units].astype(np.int64)                     # (8,)
    P = bexp[syn_pw]                                        # (32, 255)
    Cs = gmul_vec(U[None, None, :], P[:, :, None])          # (32, 255, 8)
    msyn = np.transpose(bits_of(Cs), (1, 2, 0, 3)).reshape(_N * 8, _T2 * 8)

    # Chien: lam_eval_p = XOR_k Lam_k * bexp[chien_pw[p, k]]
    A = bexp[chien_pw]                                      # (255, 33)
    Cc = gmul_vec(units[None, None, :], A[:, :, None])      # (255, 33, 8)
    mchien = np.transpose(bits_of(Cc), (1, 2, 0, 3)).reshape(
        _NPOLY * 8, _N * 8
    )

    # Forney numerator with X^{1-FCR} absorbed:
    #   num_p = beta^{p(1-FCR)} * XOR_k Om_k * bexp[chien_pw[p, k<32]]
    p = np.arange(_N)
    xpow = bexp[(p * (1 - _FCR)) % 255]                     # (255,)
    Ao = gmul_vec(bexp[chien_pw[:, :_T2]], xpow[:, None])   # (255, 32)
    Co = gmul_vec(units[None, None, :], Ao[:, :, None])     # (255, 32, 8)
    mom = np.transpose(bits_of(Co), (1, 2, 0, 3)).reshape(_T2 * 8, _N * 8)

    # Lambda' (formal derivative = odd coefficients):
    #   dlam_p = XOR_{k odd} Lam_k * beta^{(255-p)(k-1)}
    dpw = ((255 - p)[:, None] * (np.arange(1, _NPOLY, 2) - 1)[None, :]) % 255
    Cd = gmul_vec(units[None, None, :], bexp[dpw][:, :, None])  # (255,16,8)
    mdl = np.transpose(bits_of(Cd), (1, 2, 0, 3)).reshape(16 * 8, _N * 8)

    return msyn, mchien, mom, mdl


@functools.partial(jax.jit, static_argnames=("sparse_max",))
def rs_decode(
    received: jax.Array, sparse_max: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Decode `(B, 255)` dual-basis codewords.

    Returns `(corrected, nerrors)`: corrected `(B, 255)` dual-basis bytes
    (parity included) and `(B,)` int32 corrected-symbol counts, -1 on
    decode failure (uncorrectable), matching `decode_ccsds`.

    Gather-free: the linear sweeps (syndromes/Chien/Forney evals) are GF(2)
    bit-matmuls on the MXU; data*data products use the carry-less
    `_gfmul_bits`; inversion is a squaring chain (`_gfinv_bits`).
    """
    msyn = jnp.asarray(_bit_matrices()[0])
    conv_im, dual_im = _basis_images()

    rin = received.astype(jnp.int32)
    B = rin.shape[0]
    r = _bitlinear_bytes(rin, conv_im)                   # conventional basis

    # ---- syndromes: one (B, 2040) @ (2040, 256) bit-matmul --------------
    rbits = _bytes_to_bits_f32(rin)
    S = _parity_bits_to_bytes(
        jnp.dot(rbits, msyn, preferred_element_type=jnp.float32)
    )                                                               # (B, 32)
    has_err = jnp.any(S != 0, axis=-1)

    # Zero-syndrome fast path: when NO codeword in the batch has errors
    # (the steady-state clean-sky case — post-Viterbi output is usually
    # error-free), skip BM/Chien/Forney entirely.  Exact: the full path
    # returns (r, 0) for clean rows anyway (Lambda = 1 has no roots).
    # Limitation: under vmap the cond predicate becomes batched, so it
    # lowers to a select and BOTH branches always execute — still exact,
    # but no clean-sky speedup.  This hits the sharded decode paths
    # (parallel/channels.py and parallel/distributed.py wrap
    # shard_map(vmap(_decode))) and decode_multi.  The flagship flat
    # decode_frames path (decoder._fec_stack -> rs_decode_frame) calls
    # rs_decode ONCE on the flattened (B*4, 255) block batch — no vmap —
    # so the fast path applies where the headline decode throughput is
    # measured.
    #
    # Sparse-error middle path (`sparse_max` = Kmax > 0): realistic
    # streams are mostly clean with a few errored frames, which the
    # batch-wide cond alone cannot exploit — ONE errored row used to drag
    # all B rows through BM/Chien/Forney (the round-4 22% errored-path
    # cost).  When 0 < K <= Kmax rows carry errors, compact those rows to
    # a (Kmax, *) batch, correct only them, and scatter the error
    # patterns back.  All data movement is one-hot f32 matmuls (exact:
    # each output sums exactly one nonzero; a row gather would serialize
    # on TPU), so results are bit-identical to the full path.
    if sparse_max is None:
        sparse_max = _default_sparse_max(B)

    def _clean(S, r, has_err):
        return r, jnp.zeros((B,), jnp.int32)

    if sparse_max and sparse_max < B:
        Kmax = sparse_max

        def _sparse(S, r, has_err):
            # Errored rows first, original order preserved (stable sort).
            order = jnp.argsort(jnp.logical_not(has_err), stable=True)
            sel = order[:Kmax]                                  # (Kmax,)
            Pf = (
                sel[:, None] == jnp.arange(B, dtype=sel.dtype)[None, :]
            ).astype(jnp.float32)                               # (Kmax, B)
            # Compact via exact one-hot matmuls (values < 2^24).
            S_k = jnp.dot(
                Pf, S.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            r_k = jnp.dot(
                Pf, r.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            he_k = jnp.any(S_k != 0, axis=-1)
            corr_k, nerr_k = _rs_correct(S_k, r_k, he_k, B=Kmax)
            # Scatter back: each full row receives <= 1 compact row's
            # contribution (sel indices are distinct), so the transpose
            # one-hot matmul reproduces values exactly; untouched rows
            # get 0 (clean rows selected as Kmax padding have e = 0).
            e_k = (corr_k ^ r_k).astype(jnp.float32)
            e_full = jnp.dot(
                Pf.T, e_k, preferred_element_type=jnp.float32
            ).astype(jnp.int32)
            nerr = jnp.dot(
                Pf.T, nerr_k.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            return r ^ e_full, nerr

        nerrored = jnp.sum(has_err.astype(jnp.int32))
        corrected_conv, nerr = jax.lax.cond(
            nerrored > 0,
            lambda S, r, has_err: jax.lax.cond(
                nerrored <= Kmax,
                _sparse,
                functools.partial(_rs_correct, B=B),
                S, r, has_err,
            ),
            _clean,
            S, r, has_err,
        )
    else:
        corrected_conv, nerr = jax.lax.cond(
            jnp.any(has_err),
            functools.partial(_rs_correct, B=B),
            _clean,
            S, r, has_err,
        )
    return _bitlinear_bytes(corrected_conv, dual_im).astype(jnp.uint8), nerr


def _default_sparse_max(B: int) -> int:
    """Auto Kmax for the sparse-error path: ~B/16 rounded up to 128, only
    for batches big enough that compaction pays (the compaction matmuls
    cost ~Kmax*B*255 f32 FLOPs; at B >= 1024 that is far below the full
    BM/Chien/Forney cost they avoid).  XRIT_RS_SPARSE=0 disables (A/B
    knob)."""
    import os

    if B < 1024 or os.environ.get("XRIT_RS_SPARSE", "1") == "0":
        return 0
    return min(B // 2, -(-max(128, B // 16) // 128) * 128)


def _rs_correct(S, r, has_err, *, B):
    """The errored path: BM + Chien + Forney on `(B, 32)` syndromes,
    correcting `(B, 255)` conventional-basis codewords."""
    _, mchien, mom, mdl = (jnp.asarray(m) for m in _bit_matrices())

    # ---- Berlekamp-Massey: scan over 32 masked iterations ---------------
    # Hankel windows of S built OUTSIDE the scan from static slices, so the
    # scan body has no traced-index gathers: Sg_all[rr, :, k] = S_{rr-k}.
    Szp = jnp.concatenate([jnp.zeros((B, _NPOLY), jnp.int32), S], axis=-1)
    Sg_all = jnp.stack(
        [jnp.flip(Szp[:, rr + 1 : rr + 1 + _NPOLY], -1) for rr in range(_T2)]
    )                                                     # (32, B, 33)

    Lam = jnp.zeros((B, _NPOLY), jnp.int32).at[:, 0].set(1)
    Bp = jnp.zeros((B, _NPOLY), jnp.int32).at[:, 0].set(1)
    L = jnp.zeros((B,), jnp.int32)
    binv = jnp.ones((B,), jnp.int32)     # 1/bscal, maintained incrementally

    def bm_step(carry, xs):
        Lam, Bp, L, binv = carry
        rr, Sg = xs
        d = _xor_reduce(_gfmul_bits(Lam, Sg), 1)          # (B,)
        Bx = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), Bp[:, :-1]], -1)
        frac = _gfmul_bits(d, binv)
        adj = _gfmul_bits(frac[:, None], Bx)
        newLam = jnp.where((d != 0)[:, None], Lam ^ adj, Lam)
        grow = (d != 0) & (2 * L <= rr)
        newBp = jnp.where(grow[:, None], Lam, Bx)
        newbinv = jnp.where(grow, _gfinv_bits(d), binv)
        newL = jnp.where(grow, rr + 1 - L, L)
        return (newLam, newBp, newL, newbinv), None

    (Lam, _, L, _), _ = jax.lax.scan(
        bm_step, (Lam, Bp, L, binv),
        (jnp.arange(_T2, dtype=jnp.int32), Sg_all),
    )

    # ---- Chien search (bit-matmul) --------------------------------------
    lam_bits = _bytes_to_bits_f32(Lam)                               # (B, 264)
    lam_eval = _parity_bits_to_bytes(
        jnp.dot(lam_bits, mchien, preferred_element_type=jnp.float32)
    )                                                                # (B, 255)
    root = lam_eval == 0
    nroots = jnp.sum(root, axis=-1).astype(jnp.int32)

    # ---- Omega = S(x)*Lambda(x) mod x^32 (dense windowed product) -------
    # Om_j = XOR_i S_i * Lam_{j-i}; windows built from static slices.
    LamP = jnp.concatenate(
        [jnp.zeros((B, _T2 - 1), jnp.int32), Lam[:, :_T2]], axis=-1
    )                                                     # (B, 63)
    W = jnp.stack(
        [jnp.flip(LamP[:, j : j + _T2], -1) for j in range(_T2)], axis=1
    )                                                     # (B, 32, 32)
    Om = _xor_reduce(_gfmul_bits(S[:, None, :], W), 2)    # (B, 32)

    # ---- Forney evaluations (bit-matmuls) -------------------------------
    num = _parity_bits_to_bytes(
        jnp.dot(_bytes_to_bits_f32(Om), mom,
                preferred_element_type=jnp.float32)
    )                                                    # (B, 255), xpow in
    dl = Lam[:, 1::2]                                                # (B, 16)
    dlam_eval = _parity_bits_to_bytes(
        jnp.dot(_bytes_to_bits_f32(dl), mdl,
                preferred_element_type=jnp.float32)
    )                                                                # (B, 255)

    e = _gfmul_bits(
        num, _gfinv_bits(jnp.where(dlam_eval == 0, 1, dlam_eval))
    )
    e = jnp.where(root & (dlam_eval != 0), e, 0)                     # (B, 255)

    # Error at power p sits at byte index 254 - p.
    e_bytes = jnp.flip(e, axis=-1)
    corrected_conv = r ^ e_bytes

    ok_decode = (~has_err) | ((nroots == L) & (L > 0) & (L <= C.RS_T))
    nerr = jnp.where(has_err, jnp.where(ok_decode, L, -1), 0)
    corrected_conv = jnp.where(ok_decode[:, None], corrected_conv, r)
    return corrected_conv, nerr


def rs_decode_frame(frames: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Decode `(B, 1020)` derandomized frame bytes (4-way interleave).

    Returns `(corrected (B, 1020) uint8, nerrors (B, 4) int32)` — the
    batched equivalent of the reference's per-frame RS loop
    (newdecoder.cpp:313-319).
    """
    B = frames.shape[0]
    blocks = deinterleave(frames).reshape(B * C.RS_BLOCKS, _N)
    corr, nerr = rs_decode(blocks)
    corr = interleave(corr.reshape(B, C.RS_BLOCKS, _N))
    return corr, nerr.reshape(B, C.RS_BLOCKS)


# --------------------------------------------------------------------------
# Host-side encoder (fixtures/tests; the satellite is the real encoder)
# --------------------------------------------------------------------------

def rs_encode_np(data: np.ndarray) -> np.ndarray:
    """Encode `(..., 223)` dual-basis data -> `(..., 255)` dual codewords.

    Vectorized over rows: the LFSR division steps through the 223 message
    positions sequentially, but each step's feedback multiply runs as one
    table-gathered numpy op across all rows and the 32 parity lanes —
    bit-identical to the per-symbol recurrence (pinned by the frozen
    known-answer literals in tests/test_rs_kat.py)."""
    bexp, blog, taltab, tal1tab, g = _gf_tables()
    data = np.asarray(data, np.uint8)
    flat = data.reshape(-1, _K)
    R = flat.shape[0]
    msg = tal1tab[flat].astype(np.int32)                 # (R, 223) conv basis
    # g reversed: gr[d] = g[_T2 - 1 - d]; log of each (g has no zero coeffs
    # for this code, but mask anyway for safety).
    gr = np.asarray([int(g[_T2 - 1 - d]) for d in range(_T2)], np.int32)
    glog = blog[gr]                                       # (32,)
    gzero = gr == 0
    par = np.zeros((R, _T2), np.int32)
    for i in range(_K):
        fb = msg[:, i] ^ par[:, 0]                        # (R,)
        par[:, :-1] = par[:, 1:]
        par[:, -1] = 0
        nz = fb != 0
        if nz.any():
            prod = bexp[blog[fb[nz]][:, None] + glog[None, :]]
            prod = np.where(gzero[None, :], 0, prod)
            par[nz] ^= prod
    out = np.zeros((R, _N), np.uint8)
    out[:, :_K] = flat
    out[:, _K:] = taltab[par.astype(np.uint8)]
    return out.reshape(data.shape[:-1] + (_N,))
