"""Pallas TPU kernel for the CCSDS rate-1/2 K=7 Viterbi decoder.

Replaces the XLA `lax.scan` form (ops/viterbi.py) whose 8256 tiny
`(B, 64)` steps stage through HBM and dominate the decode chain (~63 ms at
B=256).  Reference semantics: SatHelper `Viterbi27` (over libcorrect) at
/root/reference/decoder/src/newdecoder.cpp:281.

Design:
  - Frames pack as `(8, L)` sublane x lane planes (B = 8*L), so one ACS
    update for all frames is a single full-width VPU op.
  - The 64 path metrics are individual `(8, L)` values carried through an
    inner `fori_loop` — the state dimension is UNROLLED in Python, so
    metrics live in vector registers; there is no state-axis gather (the
    predecessor wiring pm[n>>1], pm[(n>>1)+32] is static Python indexing).
  - Branch metrics come from 3 adds: the four +-a+-b combinations, each
    state picking its pair by the static sign tables.
  - Decisions bit-pack into two int32 words per step (bit n&31 of word
    n>>5), written as a `(T, 2, 8, L)` plane array; time is pipelined by a
    sequential 1D grid with the metrics persisted in VMEM scratch.
  - Traceback is a second, reverse-grid kernel: per step a bounded-range
    variable shift extracts the decision bit of the current state — all
    elementwise, no gathers.

Float semantics match ops/viterbi.py bit-for-bit: `a*g1 + b*g2` with
g in {+-1} equals the corresponding +-a+-b sum under IEEE arithmetic, and
the max/compare order is identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xritdemod_tpu.ops import conv_code
from xritdemod_tpu.ops.viterbi import corrected_bits

__all__ = ["viterbi_decode_pallas", "viterbi_decode_segmented"]

_NS = conv_code.NUM_STATES  # 64


@functools.lru_cache(maxsize=None)
def _sign_tables():
    g1_0, g2_0, g1_1, g2_1 = conv_code.branch_signs()
    return (
        tuple(int(v) for v in g1_0),
        tuple(int(v) for v in g2_0),
        tuple(int(v) for v in g1_1),
        tuple(int(v) for v in g2_1),
    )


def _fwd_kernel(x_ref, dec_ref, pm_out, pm_a, pm_b, *, rows):
    """One grid step = `rows` ACS trellis steps.

    The 64 path metrics live in VMEM scratch, ping-ponged `pm_a` -> `pm_b`
    -> `pm_a` per row pair: carrying them as a 64-plane fori_loop tuple
    (the previous form) keeps ~256 vector registers live at L=512 and
    Mosaic spills the whole carry every step — the explicit butterfly
    iteration loads each predecessor plane exactly once (states 2j/2j+1
    share preds j and j+32) and stores each new plane once, ~1.9x faster
    at the bench shapes.  Float semantics are unchanged (same adds, same
    compare order) so outputs stay bit-identical.
    """
    g1_0, g2_0, g1_1, g2_1 = _sign_tables()

    @pl.when(pl.program_id(0) == 0)
    def _():
        pm_a[:] = jnp.zeros_like(pm_a)

    def step(r, src, dst):
        a = x_ref[r, 0]                                  # (8, L)
        b = x_ref[r, 1]
        spp = a + b
        spm = a - b
        smp = b - a
        smm = -spp

        def bm(g1, g2):
            return {
                (1, 1): spp, (1, -1): spm, (-1, 1): smp, (-1, -1): smm
            }[(g1, g2)]

        w0 = None
        w1 = None
        for j in range(_NS // 2):
            pj = src[j]                                  # pred of 2j, 2j+1
            pk = src[j + _NS // 2]
            for n in (2 * j, 2 * j + 1):
                c0 = pj + bm(g1_0[n], g2_0[n])
                c1 = pk + bm(g1_1[n], g2_1[n])
                dec = c1 > c0
                dst[n] = jnp.where(dec, c1, c0)
                mask = np.uint32(1 << (n & 31)).astype(np.int32)  # bit 31 wraps
                dbit = jnp.where(dec, mask, 0)
                if n < 32:
                    w0 = dbit if w0 is None else (w0 | dbit)
                else:
                    w1 = dbit if w1 is None else (w1 | dbit)
        dec_ref[r, 0] = w0
        dec_ref[r, 1] = w1

    def pair(i, _):
        step(2 * i, pm_a, pm_b)
        step(2 * i + 1, pm_b, pm_a)
        return 0

    jax.lax.fori_loop(0, rows // 2, pair, 0)
    if rows % 2:
        step(rows - 1, pm_a, pm_b)
        pm_a[:] = pm_b[:]

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        pm_out[:] = pm_a[:]


def _fwd_kernel_reg(x_ref, dec_ref, pm_out, pm_scr, *, rows):
    """Register-carried variant for NARROW lane counts (L <= 128).

    The 64 path-metric planes ride a fori_loop carry tuple — at L <= 128
    they fit the vector registers, and this form measured ~25% faster
    than the VMEM ping-pong at B=256/S=4 (L=128: 51k vs 40k frames/s,
    the host StreamDecoder's small-batch shape).  At L >= 512 the carry
    spills and the ping-pong `_fwd_kernel` wins ~1.9x; `_decode_bits`
    dispatches on L.  Same adds and compare order — outputs are
    bit-identical to the ping-pong form.
    """
    g1_0, g2_0, g1_1, g2_1 = _sign_tables()

    @pl.when(pl.program_id(0) == 0)
    def _():
        pm_scr[:] = jnp.zeros_like(pm_scr)

    def body(r, pm):
        a = x_ref[r, 0]                                  # (8, L)
        b = x_ref[r, 1]
        spp = a + b
        spm = a - b
        smp = b - a
        smm = -spp

        def bm(g1, g2):
            return {
                (1, 1): spp, (1, -1): spm, (-1, 1): smp, (-1, -1): smm
            }[(g1, g2)]

        new = []
        w0 = None
        w1 = None
        for n in range(_NS):
            c0 = pm[n >> 1] + bm(g1_0[n], g2_0[n])
            c1 = pm[(n >> 1) + _NS // 2] + bm(g1_1[n], g2_1[n])
            dec = c1 > c0
            new.append(jnp.where(dec, c1, c0))
            mask = np.uint32(1 << (n & 31)).astype(np.int32)  # bit 31 wraps
            dbit = jnp.where(dec, mask, 0)
            if n < 32:
                w0 = dbit if w0 is None else (w0 | dbit)
            else:
                w1 = dbit if w1 is None else (w1 | dbit)
        dec_ref[r, 0] = w0
        dec_ref[r, 1] = w1
        return tuple(new)

    pm = tuple(pm_scr[n] for n in range(_NS))
    pm = jax.lax.fori_loop(0, rows, body, pm)
    for n in range(_NS):
        pm_scr[n] = pm[n]

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        for n in range(_NS):
            pm_out[n] = pm[n]


def _back_kernel(dec_ref, st0_ref, bits_ref, st_out, st_scr, *, rows):
    @pl.when(pl.program_id(0) == 0)
    def _():
        st_scr[:] = st0_ref[:]

    def body(i, state):
        r = rows - 1 - i
        w0 = dec_ref[r, 0]
        w1 = dec_ref[r, 1]
        word = jnp.where(state < _NS // 2, w0, w1)
        took = (word >> (state & 31)) & 1
        bits_ref[r] = state & 1
        return (state >> 1) + took * (_NS // 2)

    state = jax.lax.fori_loop(0, rows, body, st_scr[:])
    st_scr[:] = state

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        st_out[:] = state


def _pick_tb(T: int, L: int, budget_rows: int = 320,
             even_bias: bool = True) -> int:
    # Keep the per-grid-step VMEM block (x + dec planes, double-buffered)
    # bounded: rows cost 2*8*L*4 bytes each for x and again for dec.
    budget_rows = min(budget_rows, max(8, (10 << 20) // (2 * 8 * L * 4 * 4)))
    # The ping-pong fwd kernel pays one extra full pm copy per grid step
    # on an odd tile — but a bigger tile still wins on per-step
    # launch/DMA overhead.  Score odd tiles at half weight (the pm copy
    # is comparable to a step's fixed cost) instead of skipping them:
    # T=2312 (B=256 S=4 windows) picks 289 over even 136, while even-rich
    # lengths still pick the largest even tile.  The register-carry
    # variant (even_bias=False) has no odd-tile penalty.
    best, best_score = 1, 0.0
    for tb in range(1, T + 1):
        if T % tb == 0 and tb <= budget_rows:
            score = float(tb)
            if even_bias and tb % 2:
                score /= 2.0
            if score >= best_score:
                best, best_score = tb, score
    return best


def _decode_bits(soft: jax.Array, interpret: bool) -> jax.Array:
    """`(B, 2T)` soft -> `(B, T)` uint8 survivor bits (B multiple of 8)."""
    soft = soft.astype(jnp.float32)
    B, T2 = soft.shape
    T = T2 // 2
    if B % 8:
        raise ValueError(f"B={B} must be a multiple of 8")
    L = B // 8
    # Narrow lane counts keep the 64 metric planes register-resident
    # (see _fwd_kernel_reg); wide ones ping-pong them through VMEM.
    reg = L <= 128
    TB = _pick_tb(T, L, even_bias=not reg)
    f32 = jnp.float32
    i32 = jnp.int32

    # (B, 2T) -> (T, 2, 8, L) planes
    x = soft.reshape(B, T, 2)
    x = jnp.moveaxis(x, 0, -1).reshape(T, 2, 8, L)

    blk = pl.BlockSpec((TB, 2, 8, L), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    fwd = _fwd_kernel_reg if reg else _fwd_kernel
    scratch = [pltpu.VMEM((_NS, 8, L), f32)]
    if not reg:
        scratch.append(pltpu.VMEM((_NS, 8, L), f32))
    dec, pm = pl.pallas_call(
        functools.partial(fwd, rows=TB),
        grid=(T // TB,),
        out_shape=(
            jax.ShapeDtypeStruct((T, 2, 8, L), i32),
            jax.ShapeDtypeStruct((_NS, 8, L), f32),
        ),
        in_specs=[blk],
        out_specs=(blk, full),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x)

    # Best end state: argmax over the 64 metric planes.
    pm_flat = pm.reshape(_NS, B)
    end_state = jnp.argmax(pm_flat, axis=0).astype(i32).reshape(8, L)

    bblk = pl.BlockSpec((TB, 2, 8, L), lambda i: (pl.num_programs(0) - 1 - i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((TB, 8, L), lambda i: (pl.num_programs(0) - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    bits_planes, _ = pl.pallas_call(
        functools.partial(_back_kernel, rows=TB),
        grid=(T // TB,),
        out_shape=(
            jax.ShapeDtypeStruct((T, 8, L), i32),
            jax.ShapeDtypeStruct((8, L), i32),
        ),
        in_specs=[bblk, full],
        out_specs=(oblk, full),
        scratch_shapes=[pltpu.VMEM((8, L), i32)],
        interpret=interpret,
    )(dec, end_state)

    return jnp.moveaxis(bits_planes.reshape(T, B), 0, -1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_decode_pallas(
    soft: jax.Array, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for `viterbi.viterbi_decode`: `(B, 2T)` soft -> bits, errors.

    B must be a multiple of 8 (frames pack into 8 sublanes).
    """
    soft = soft.astype(jnp.float32)
    bits = _decode_bits(soft, interpret)
    hard = (soft < 0).astype(jnp.uint8)
    errors = corrected_bits(bits, hard)
    return bits, errors


@functools.partial(
    jax.jit, static_argnames=("segments", "overlap", "interpret")
)
def viterbi_decode_segmented(
    soft: jax.Array,
    segments: int = 8,
    overlap: int = 128,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Segment-parallel Viterbi: same API as `viterbi_decode_pallas`.

    The trellis is inherently sequential, so the plain kernel's wall time is
    ~T ACS steps regardless of batch.  Here each frame's T steps split into
    `segments` independent windows decoded concurrently; every window is
    extended by `overlap` warmup steps before its kept region (forward path
    metrics from a neutral init converge to the true survivors within a few
    constraint lengths — the same approximation the reference makes at every
    frame boundary with its 64-bit history prefix,
    /root/reference/decoder/src/newdecoder.cpp:272-276) and `overlap` tail
    steps after it (so traceback enters the kept region converged).

    Sequential depth drops ~`segments`x; batch grows `segments`x (filling
    the 128-wide lane axis at small B).  With overlap=128 (~21 constraint
    lengths) the output is equal to the exact decoder's on any realistic
    SNR; golden tests enforce equality on noisy fixtures.
    """
    soft = soft.astype(jnp.float32)
    B, T2 = soft.shape
    T = T2 // 2
    S = segments
    Tseg = -(-T // S)
    pad_t = S * Tseg - T
    W = overlap
    Lw = W + Tseg + W

    x = soft.reshape(B, T, 2)
    xp = jnp.pad(x, ((0, 0), (W, W + pad_t), (0, 0)))
    # Regular overlapping windows: static slices, no gather.
    wins = jnp.stack(
        [xp[:, s * Tseg : s * Tseg + Lw] for s in range(S)], axis=1
    )                                                  # (B, S, Lw, 2)
    flat = wins.reshape(B * S, 2 * Lw)
    bits_all = _decode_bits(flat, interpret)           # (B*S, Lw)
    bits = bits_all[:, W : W + Tseg].reshape(B, S * Tseg)[:, :T]

    hard = (soft < 0).astype(jnp.uint8)
    errors = corrected_bits(bits, hard)
    return bits, errors
