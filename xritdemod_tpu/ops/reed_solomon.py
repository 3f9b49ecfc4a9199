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


@jax.jit
def rs_decode(received: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Decode `(B, 255)` dual-basis codewords.

    Returns `(corrected, nerrors)`: corrected `(B, 255)` dual-basis bytes
    (parity included) and `(B,)` int32 corrected-symbol counts, -1 on
    decode failure (uncorrectable), matching `decode_ccsds`.
    """
    bexp, blog = (jnp.asarray(t) for t in _jax_tables()[:2])
    syn_pw, chien_pw = (jnp.asarray(t) for t in _power_matrices())

    r = to_conventional(received)                        # (B, 255) int32
    B = r.shape[0]

    # ---- syndromes: (B, 32) --------------------------------------------
    terms = bexp[blog[r][:, None, :] + syn_pw[None, :, :]]          # (B,32,255)
    terms = jnp.where(r[:, None, :] == 0, 0, terms)
    S = _xor_reduce(terms, 2)                                       # (B, 32)
    has_err = jnp.any(S != 0, axis=-1)

    # ---- Berlekamp-Massey, fixed 32 iterations with masked updates ------
    Lam = jnp.zeros((B, _NPOLY), jnp.int32).at[:, 0].set(1)
    Bp = jnp.zeros((B, _NPOLY), jnp.int32).at[:, 0].set(1)
    L = jnp.zeros((B,), jnp.int32)
    bscal = jnp.ones((B,), jnp.int32)

    # S padded so S[r - i] gathers stay in range (indices clipped by mask).
    Szp = jnp.concatenate([S, jnp.zeros((B, _NPOLY), jnp.int32)], axis=-1)

    def bm_step(carry, rr):
        Lam, Bp, L, bscal = carry
        idx = rr - jnp.arange(_NPOLY)                    # (33,)
        valid = idx >= 0
        Sg = jnp.where(valid[None, :], Szp[:, jnp.clip(idx, 0)], 0)
        d = _xor_reduce(_gfmul(Lam, Sg, bexp, blog), 1)  # (B,)

        Bx = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), Bp[:, :-1]], -1)
        # frac = d / bscal  (bscal is never 0)
        inv_b = bexp[255 - blog[bscal]]
        frac = _gfmul(d, inv_b, bexp, blog)
        adj = _gfmul(frac[:, None], Bx, bexp, blog)
        newLam = jnp.where((d != 0)[:, None], Lam ^ adj, Lam)
        grow = (d != 0) & (2 * L <= rr)
        newBp = jnp.where(grow[:, None], Lam, Bx)
        newb = jnp.where(grow, d, bscal)
        newL = jnp.where(grow, rr + 1 - L, L)
        return (newLam, newBp, newL, newb), None

    (Lam, _, L, _), _ = jax.lax.scan(
        bm_step, (Lam, Bp, L, bscal), jnp.arange(_T2, dtype=jnp.int32)
    )

    # ---- Chien search: roots of Lambda over beta^{-p}, p = 0..254 -------
    lam_log = blog[Lam]                                              # (B, 33)
    cterm = bexp[lam_log[:, None, :] + chien_pw[None, :, :]]         # (B,255,33)
    cterm = jnp.where(Lam[:, None, :] == 0, 0, cterm)
    lam_eval = _xor_reduce(cterm, 2)                                 # (B, 255)
    root = lam_eval == 0                                             # (B, 255)
    nroots = jnp.sum(root, axis=-1).astype(jnp.int32)

    # ---- Forney: Omega = S(x)*Lambda(x) mod x^32 ------------------------
    jj = jnp.arange(_T2)
    ii = jnp.arange(_T2)
    # conv[j] = XOR_i S[i] * Lam[j-i], 0 <= j-i <= 32
    diff = jj[:, None] - ii[None, :]                                 # (32, 32)
    ok = (diff >= 0) & (diff < _NPOLY)
    Lg = jnp.where(ok[None], Lam[:, jnp.clip(diff, 0, _NPOLY - 1)], 0)
    Om = _xor_reduce(_gfmul(S[:, None, :], Lg, bexp, blog), 2)       # (B, 32)

    # Evaluate at X^{-1} = beta^{-p}: Omega(beta^{-p}), Lambda'(beta^{-p}).
    om_log = blog[Om]
    opw = jnp.asarray(_power_matrices()[1][:, :_T2])                 # (255, 32)
    oterm = bexp[om_log[:, None, :] + opw[None, :, :]]
    oterm = jnp.where(Om[:, None, :] == 0, 0, oterm)
    om_eval = _xor_reduce(oterm, 2)                                  # (B, 255)

    # Lambda'(x) = sum over odd k of Lambda_k x^(k-1)
    kodd = jnp.arange(1, _NPOLY, 2)
    dl = Lam[:, kodd]                                                # (B, 16)
    dpw = jnp.asarray(
        (((255 - np.arange(_N))[:, None] * (np.arange(1, _NPOLY, 2) - 1)[None, :])
         % 255).astype(np.int32)
    )                                                                # (255, 16)
    dterm = bexp[blog[dl][:, None, :] + dpw[None, :, :]]
    dterm = jnp.where(dl[:, None, :] == 0, 0, dterm)
    dlam_eval = _xor_reduce(dterm, 2)                                # (B, 255)

    # e_p = X^{1-FCR} * Omega(X^{-1}) / Lambda'(X^{-1}),  X = beta^p
    p = jnp.arange(_N)
    xpow = bexp[(p * (1 - _FCR)) % 255][None, :]                     # (1, 255)
    num = _gfmul(xpow, om_eval, bexp, blog)
    inv_dl = bexp[255 - blog[jnp.where(dlam_eval == 0, 1, dlam_eval)]]
    e = _gfmul(num, inv_dl, bexp, blog)
    e = jnp.where(root & (dlam_eval != 0), e, 0)                     # (B, 255)

    # Error at power p sits at byte index 254 - p.
    e_bytes = jnp.flip(e, axis=-1)
    corrected_conv = r ^ e_bytes

    ok_decode = (~has_err) | ((nroots == L) & (L > 0) & (L <= C.RS_T))
    nerr = jnp.where(has_err, jnp.where(ok_decode, L, -1), 0)
    corrected_conv = jnp.where(ok_decode[:, None], corrected_conv, r)
    return to_dual(corrected_conv).astype(jnp.uint8), nerr


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
    """Encode `(..., 223)` dual-basis data -> `(..., 255)` dual codewords."""
    bexp, blog, taltab, tal1tab, g = _gf_tables()

    def mul(a, b):
        if a == 0 or b == 0:
            return 0
        return int(bexp[blog[a] + blog[b]])

    data = np.asarray(data, np.uint8)
    flat = data.reshape(-1, _K)
    out = np.zeros((flat.shape[0], _N), np.uint8)
    for r in range(flat.shape[0]):
        msg = tal1tab[flat[r]].astype(np.int32)
        par = np.zeros(_T2, np.int32)
        for m in msg:
            fb = int(m) ^ int(par[0])
            par[:-1] = par[1:]
            par[-1] = 0
            if fb:
                for d in range(_T2):
                    # g has degree 32; g[_T2] is the monic leading term.
                    par[d] ^= mul(fb, int(g[_T2 - 1 - d]))
        out[r, :_K] = flat[r]
        out[r, _K:] = taltab[par.astype(np.uint8)]
    return out.reshape(data.shape[:-1] + (_N,))
