"""The BPSK demodulation chain as one jitted block-functional step.

TPU-native re-design of the reference demodulator hot path
(/root/reference/demodulator/src/demodulator.cpp:100-168): the reference
pulls a variable-length chunk off a mutex FIFO and runs five stateful C++
blocks in sequence on one thread; here one pure function consumes a
fixed-size `(T,)` complex block plus a small carried-state pytree and returns
soft symbols plus the next state.  Everything is `vmap`-able over channels
and shardable over a device mesh.

Chain: [decimating low-pass FIR] -> AGC -> RRC FIR -> Costas loop -> M&M
clock recovery -> Re{.} soft symbols (the reference takes the real part in
SymbolManager::add, SymbolManager.cpp:104).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu import constants as C
from xritdemod_tpu.ops import agc as agc_op
from xritdemod_tpu.ops import clock_recovery as cr_op
from xritdemod_tpu.ops import costas as costas_op
from xritdemod_tpu.ops import filters, fir
from xritdemod_tpu.utils.cplx import CF32, from_complex

__all__ = ["DemodConfig", "DemodState", "Demodulator", "quantize_symbols"]


@dataclasses.dataclass(frozen=True)
class DemodConfig:
    """Demodulator operating point (mirrors xritdemod.cfg keys)."""

    symbol_rate: int = C.LRIT_SYMBOL_RATE
    sample_rate: int = 1_250_000
    decimation: int = 1
    rrc_alpha: float = C.LRIT_RRC_ALPHA
    pll_alpha: float = C.CLOCK_ALPHA       # shipped default (demodulator.cpp:220)
    rrc_taps: int = C.RRC_TAPS
    agc_rate: float = C.AGC_RATE
    agc_reference: float = C.AGC_REFERENCE
    agc_gain: float = C.AGC_GAIN
    agc_max_gain: float = C.AGC_MAX_GAIN
    clock_alpha: float = C.CLOCK_ALPHA
    clock_mu: float = C.CLOCK_MU
    clock_omega_limit: float = C.CLOCK_OMEGA_LIMIT
    # Batch-path clock kernel: 0 = exact per-symbol GR recursion; K > 0 =
    # block-update variant (K-symbol frozen-clock parallel interpolation,
    # ops/clock_recovery.py::clock_recovery_block_update_batch).  Symbol
    # outputs differ from exact by sub-1% timing jitter; post-FEC frames
    # are bit-identical (tests/test_demod_chain.py).
    clock_block_update: int = 0
    # AGC / Costas forms for the batch path: "auto" (default) uses the
    # fused Pallas sequential kernels (ops/stream_pallas.py) on TPU when
    # channels % 128 == 0 — one HBM read+write instead of many scan
    # passes; "xla" forces the scan forms.  The Pallas AGC is the *exact*
    # sequential recursion (the XLA form approximates the max-gain clamp).
    agc_kernel: str = "auto"
    costas_kernel: str = "auto"
    # RRC FIR form: "auto" (default) uses the banded-matmul MXU form
    # (ops/fir.fir_block_real_matmul) on TPU when decimation==1 and the
    # block divides its window, else lane-wise conv; "conv"/"matmul" force.
    fir_kernel: str = "auto"
    # Channel-tile width (lanes per grid step) of the Pallas clock kernel:
    # 0 = auto (widest of 256/512/128 dividing C).  At C >= 1024 a wider
    # tile halves the number of sequential per-symbol passes per
    # tensorcore — measure per shape.
    clock_tile: int = 0
    # Super-chunks per clock-kernel window DMA (0 = kernel default 64).
    # Scales the VMEM window scratch ~linearly; ct=512 needs <= 32 to fit.
    clock_superchunks: int = 0
    # Symbols per clock-kernel chunk (0 = kernel default 8): each chunk
    # pays one mini-barrel re-alignment, and each symbol's shrinking
    # window shift costs ~(chunk - j) rows — smaller chunks shift less
    # per symbol but re-align more often.
    clock_chunk: int = 0
    # Rows per fused front-end grid step (0 = auto: 256, dropping to 128
    # at C >= 2048 and 64 at C >= 4096 where the G=C/128-plane VMEM
    # scratch would overflow).
    frontend_rows: int = 0
    # Front-end in-place FIR (-1 auto: on at G >= 32 where the dedicated
    # scratch overflows scoped VMEM; 0/1 force off/on — forcing on frees
    # ~2 of the kernel's VMEM buffers, admitting wider row tiles).
    frontend_fir_inplace: int = -1
    # Largest block (post-decimation samples) fed to the Pallas clock
    # kernel in ONE launch; longer blocks split into chained segments —
    # the kernel's window scratch grows with block length (the channel
    # index-spread bound) and exceeds the 16 MB scoped-VMEM limit past
    # ~131072 samples at ct=512.  0 = auto (1<<17).  Segments chain the
    # carried clock state exactly like consecutive stream blocks do.
    clock_max_block: int = 0
    # Batch-path clock kernel choice: "auto" (default) picks the Pallas
    # kernel (ops/clock_pallas.py — the exact recursion fused on-chip, ~5x
    # the XLA form) whenever running on TPU with channels a multiple of its
    # 128-lane tile, else the XLA kernel; "pallas"/"xla" force either.
    clock_kernel: str = "auto"
    # Fractional interpolator of the M&M clock (config key clockInterp):
    # "mmse" (default) is the GR-parity tabulated 8-tap MMSE interpolator
    # (mmse_fir_interpolator_cc structure — 129-row table, mu quantized
    # to 1/128, no runtime normalization; ops/interp_taps.py), the
    # golden model's (demod_tcp_qt.py:266) interpolator family and the
    # faster mode on TPU (demod 3299.7 vs ~3270 Msamp/s at C=2048);
    # "sinc" evaluates windowed-sinc taps at the exact mu.  Both decode
    # post-FEC bit-exact and soak identically (LONGRUN_r05 vs
    # LONGRUN_MMSE_r05: 9.5x vs 9.0x real time, 1075/1075 both); the
    # round-4 mmse soak anomaly was a symptom of the pre-round-5 M&M lag
    # deviation and is gone.  Applies to every clock kernel form (XLA
    # serial/batch/block-update and Pallas).  Shared default across
    # DemodConfig, bench.py, and the soak tools.
    clock_interp: str = "mmse"
    # K-row slab blocking inside the fused front-end kernel: 0 = exact
    # per-sample AGC/Costas recursions; K > 0 runs the AGC as an exact
    # affine prefix over K-row slabs and the Costas as the frozen-ramp
    # block update (ops/costas.costas_block_update semantics) — ~K x
    # fewer sequential steps.  Post-FEC frames stay bit-identical on
    # locked signals (tests/test_demod_chain.py).  -1 = auto: K=8 when
    # the fused TPU front-end kernel is active (measured best on-chip:
    # 2106 vs 1598 Msamp/s at C=512; K=4: 2012, K=16: 1980), exact
    # per-sample forms everywhere else (CPU stays bit-exact to the GR
    # golden model).
    frontend_block_update: int = -1
    # MXU precision of the RRC banded matmuls inside the fused front-end:
    # "highest" = exact f32; "default" = the MXU's native pass count;
    # "bf16" = cast operands to bf16 (single MXU pass).  "auto" (default)
    # = bf16 on the TPU fused path (measured 2639 vs 2557 Msamp/s at
    # C=1024), exact f32 elsewhere so CPU golden tests stay bit-exact.
    # The soft symbols only carry ~7 bits into the int8 quantizer; the
    # bf16 matched filter still decodes post-FEC bit-exact
    # (tests/test_demod_chain.py::test_frontend_bf16_rrc_chain_...).
    frontend_precision: str = "auto"
    # Front-end fusion for the batch path: "auto" (default) fuses
    # AGC + RRC + Costas into ONE channels-last Pallas kernel
    # (ops/frontend_pallas.py) feeding the channels-last clock entry —
    # one transpose per block instead of five, one HBM pass instead of
    # three — whenever the per-stage Pallas kernels would all be chosen;
    # "fused"/"split" force.  Same math as the split kernels.
    frontend_kernel: str = "auto"

    @classmethod
    def lrit(
        cls, sample_rate: int = 1_250_000, decimation: int = 1, **kw
    ) -> "DemodConfig":
        return cls(
            symbol_rate=C.LRIT_SYMBOL_RATE,
            rrc_alpha=C.LRIT_RRC_ALPHA,
            sample_rate=sample_rate,
            decimation=decimation,
            **kw,
        )

    @classmethod
    def hrit(
        cls, sample_rate: int = 3_000_000, decimation: int = 1, **kw
    ) -> "DemodConfig":
        return cls(
            symbol_rate=C.HRIT_SYMBOL_RATE,
            rrc_alpha=C.HRIT_RRC_ALPHA,
            sample_rate=sample_rate,
            decimation=decimation,
            **kw,
        )

    @property
    def circuit_sample_rate(self) -> float:
        return self.sample_rate / self.decimation

    @property
    def sps(self) -> float:
        return self.circuit_sample_rate / self.symbol_rate


class DemodState(NamedTuple):
    dec_hist: CF32
    agc_gain: jax.Array
    rrc_hist: CF32
    costas: costas_op.CostasState
    clock: cr_op.ClockRecoveryState


class Demodulator:
    """Builds taps/params for a config and exposes a jitted block step.

    `block_len` is the number of complex input samples consumed per step
    (must be a multiple of `decimation`).
    """

    def __init__(self, config: DemodConfig, block_len: int = 1 << 17):
        if block_len % config.decimation:
            raise ValueError("block_len must be a multiple of decimation")
        if config.clock_interp not in ("sinc", "mmse"):
            raise ValueError(
                f"clock_interp must be 'sinc' or 'mmse', "
                f"got {config.clock_interp!r}"
            )
        self.config = config
        self.block_len = block_len

        # Tap design exactly as demodulator.cpp:443-444.
        self._rrc_taps = jnp.asarray(
            filters.rrc_taps(
                1.0,
                config.circuit_sample_rate,
                config.symbol_rate,
                config.rrc_alpha,
                config.rrc_taps,
            )
        )
        if config.decimation > 1:
            self._dec_taps = jnp.asarray(
                filters.lowpass_taps(
                    1.0,
                    config.sample_rate,
                    config.circuit_sample_rate / 2.0,
                    100e3,
                )
            )
        else:
            self._dec_taps = jnp.ones((1,), jnp.float32)

        self._agc = agc_op.AgcParams(
            rate=config.agc_rate,
            reference=config.agc_reference,
            gain=config.agc_gain,
            max_gain=config.agc_max_gain,
        )
        self._costas = costas_op.costas_gains(config.pll_alpha)
        self._clock = cr_op.ClockRecoveryParams(
            omega=config.sps,
            gain_omega=config.clock_alpha * config.clock_alpha / 4.0,
            gain_mu=config.clock_alpha,
            omega_relative_limit=config.clock_omega_limit,
        )
        # Clock-kernel segmentation for long blocks (see clock_max_block):
        # blocks past the kernel's VMEM envelope run as chained segments on
        # the Pallas batch paths; num_slots then budgets per-segment slots.
        # A non-divisible cap falls back to the smallest segment count whose
        # equal split fits under it (never silently ignored).
        seg = config.clock_max_block or (1 << 17)
        td = block_len // config.decimation
        if td > seg:
            segs = -(-td // seg)          # ceil
            while td % segs:
                segs += 1
            self._clock_segs = segs
            self.num_slots = segs * cr_op.max_symbols(td // segs, self._clock)
        else:
            self._clock_segs = 1
            self.num_slots = cr_op.max_symbols(td, self._clock)
        # Static tuple form of the RRC taps for the fused Pallas front-end
        # (its banded matrix is built host-side from a hashable key).
        self._rrc_taps_t = tuple(
            float(v) for v in np.asarray(self._rrc_taps)
        )
        self._step = jax.jit(functools.partial(self._block))

    def snr_estimate(self, x, state: DemodState) -> jax.Array:
        """Per-block RMS-ratio SNR estimate in dB (ops/snr.py — the GR
        golden-model figure the reference C++ app lacks,
        demod_tcp_qt.py:263-298).  `x` is a raw `(..., T)` input block;
        runs AGC from the carried gain (diagnostic tap — does not advance
        state)."""
        if not isinstance(x, CF32):
            x = from_complex(x)
        if self.config.decimation > 1:
            x, _ = fir.fir_block(
                x, self._dec_taps, state.dec_hist, self.config.decimation
            )
        y, _ = agc_op.agc_block(x, state.agc_gain, self._agc)
        from xritdemod_tpu.ops.snr import snr_estimate_db

        hpf = tuple(
            float(v)
            for v in filters.highpass_taps(
                1.0,
                self.config.circuit_sample_rate,
                float(self.config.symbol_rate),
                300e3,
            )
        )
        return snr_estimate_db(y, self._rrc_taps_t, hpf)

    def _clock_pallas_kw(self, interp: bool, channels: int = 0) -> dict:
        """Pallas clock-kernel launch options for the batch path.

        `clock_block_update=K` selects the frozen-clock K-symbol block
        update fused in the kernel (chunk=K); interpret mode (CPU tests)
        shrinks the geometry — the production 8x64 unrolls 512 symbol
        steps and takes minutes to trace op-by-op.  Passing `channels`
        applies the wide-batch auto-tune: at C >= 1024 (C % 512 == 0) a
        ct=512 lane tile halves the sequential per-symbol passes per
        tensorcore (measured 2877 vs 2639 Msamp/s at C=1024), with
        superchunks=32 keeping the window scratch within the 16 MB
        scoped-VMEM limit.
        """
        K = self.config.clock_block_update
        kw = {}
        if K:
            kw.update(block_update=True, chunk=K,
                      superchunks=max(2, 512 // K))
        if self.config.clock_tile:
            kw.update(ct=self.config.clock_tile)
        if self.config.clock_superchunks:
            kw.update(superchunks=self.config.clock_superchunks)
        if not interp and channels >= 1024 and channels % 512 == 0:
            kw.setdefault("ct", 512)
            # superchunks=24 keeps the ct=512 window scratch inside the
            # 16 MB scoped-VMEM envelope (sc=32 compiled pre-round-5; the
            # GR lag-convention fix shifted Mosaic's live ranges ~2 MB
            # over the cliff) and measures FASTER: 3299.7 Msamp/s at
            # C=2048 vs 3284.6 (r4, sc=32), 3156 at sc=16, 3054 with
            # clock_max_block=65536 segmentation, 2844 at ct=256.
            kw.setdefault("superchunks", 24)
        if self.config.clock_chunk and not K:
            kw.update(chunk=self.config.clock_chunk)
        if interp:
            kw.update(chunk=min(4, K) if K else 4, superchunks=2)
        if self.config.clock_interp != "sinc":
            kw.update(interp_mode=self.config.clock_interp)
        return kw

    def _run_clock_segs(self, run_seg, T_: int, cstate):
        """Run a Pallas clock kernel as `self._clock_segs` chained segments
        over the time axis (see clock_max_block): a segment boundary is
        exactly a stream-block boundary, so the carried state makes the
        split bit-identical to one long launch of a smaller block.

        `run_seg(start, rows, slots, cstate) -> (soft (C, slots), valid,
        cstate)` runs the kernel on `rows` time samples from `start`.
        """
        segs = self._clock_segs
        seg_rows = T_ // segs
        slots_seg = self.num_slots // segs
        sr_parts, v_parts = [], []
        for i in range(segs):
            s_i, v_i, cstate = run_seg(i * seg_rows, seg_rows, slots_seg, cstate)
            sr_parts.append(s_i)
            v_parts.append(v_i)
        soft = sr_parts[0] if segs == 1 else jnp.concatenate(sr_parts, axis=1)
        valid = v_parts[0] if segs == 1 else jnp.concatenate(v_parts, axis=1)
        return soft, valid, cstate

    def _fir_method(self, n_after_decim: int) -> str:
        cfg = self.config
        if cfg.fir_kernel != "auto":
            return cfg.fir_kernel
        ok = (
            cfg.decimation == 1
            and n_after_decim % 256 == 0
            and jax.default_backend() == "tpu"
        )
        return "matmul" if ok else "conv"

    # -- state ------------------------------------------------------------
    def init_state(self) -> DemodState:
        return DemodState(
            dec_hist=fir.fir_init(int(self._dec_taps.shape[0])),
            agc_gain=agc_op.agc_init(self._agc),
            rrc_hist=fir.fir_init(int(self._rrc_taps.shape[0])),
            costas=costas_op.costas_init(),
            clock=cr_op.clock_recovery_init(self._clock, self.config.clock_mu),
        )

    # -- the jitted step ----------------------------------------------------
    def _block(self, x: CF32, state: DemodState):
        cfg = self.config
        if cfg.decimation > 1:
            x, dec_hist = fir.fir_block(
                x, self._dec_taps, state.dec_hist, cfg.decimation
            )
        else:
            dec_hist = state.dec_hist
        x, agc_gain = agc_op.agc_block(x, state.agc_gain, self._agc)
        x, rrc_hist = fir.fir_block(
            x, self._rrc_taps, state.rrc_hist,
            method=self._fir_method(x.re.shape[-1]),
        )
        x, costas_state = costas_op.costas_block(x, state.costas, self._costas)
        syms, valid, clock_state = cr_op.clock_recovery_block(
            x, state.clock, self._clock, self.num_slots,
            interp=cfg.clock_interp,
        )
        soft = syms.re   # reference takes Re{.} (SymbolManager.cpp:104)
        new_state = DemodState(
            dec_hist=dec_hist,
            agc_gain=agc_gain,
            rrc_hist=rrc_hist,
            costas=costas_state,
            clock=clock_state,
        )
        return soft, valid, new_state

    def process(self, x, state: DemodState):
        """One block: `(T,)` CF32 (or numpy complex) -> (soft, valid, state)."""
        if not isinstance(x, CF32):
            x = from_complex(x)
        return self._step(x, state)

    # -- batch path ---------------------------------------------------------
    def init_state_batch(self, channels: int) -> DemodState:
        one = self.init_state()
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (channels,) + a.shape), one
        )

    def _fused_cl(self, xT: CF32, dec_hist, state: DemodState, interp,
                  fe_bu, fe_prec, fe_rows):
        """The fused TPU path from a channels-last `(T, C)` block (the
        front-end kernel's native layout)."""
        from xritdemod_tpu.ops.clock_pallas import (
            clock_recovery_block_pallas_batch_cl,
        )
        from xritdemod_tpu.ops.frontend_pallas import demod_frontend_pallas

        T_, C_ = xT.re.shape
        fe_kw = {}
        if self.config.frontend_fir_inplace >= 0:
            fe_kw["fir_inplace"] = bool(self.config.frontend_fir_inplace)
        yT, agc_gain, rrc_hist, costas_state = demod_frontend_pallas(
            xT, state.agc_gain, state.rrc_hist, state.costas,
            self._agc, self._rrc_taps_t, self._costas,
            interpret=interp,
            block_k=fe_bu,
            precision=fe_prec,
            rows=fe_rows,
            **fe_kw,
        )
        ck_kw = self._clock_pallas_kw(interp, C_)

        # Long blocks run the clock kernel as chained segments (its
        # window scratch grows with block length — clock_max_block).
        def run_seg_cl(start, rows, slots, cstate):
            ys = CF32(yT.re[start:start + rows],
                      yT.im[start:start + rows])
            s_i, v_i, cstate = clock_recovery_block_pallas_batch_cl(
                ys, cstate, self._clock, slots,
                interpret=interp, **ck_kw,
            )
            return s_i.re, v_i, cstate

        syms_re, valid, clock_state = self._run_clock_segs(
            run_seg_cl, T_, state.clock
        )
        return syms_re, valid, DemodState(
            dec_hist=dec_hist,
            agc_gain=agc_gain,
            rrc_hist=rrc_hist,
            costas=costas_state,
            clock=clock_state,
        )

    def _resolve_fused(self, C_: int, T_: int):
        """(use_fused, interp, fe_bu, fe_prec, fe_rows) for a batch block."""
        cfg = self.config
        on_tpu = jax.default_backend() == "tpu"
        interp = not on_tpu
        stream_ok = on_tpu and C_ % 128 == 0 and T_ % 256 == 0
        use_fused = cfg.frontend_kernel == "fused" or (
            cfg.frontend_kernel == "auto"
            and stream_ok
            and cfg.agc_kernel in ("auto", "pallas")
            and cfg.costas_kernel in ("auto", "pallas")
            and cfg.fir_kernel in ("auto", "matmul")
            and cfg.clock_kernel in ("auto", "pallas")
        )
        fe_bu = cfg.frontend_block_update
        if fe_bu < 0:
            fe_bu = 8 if (use_fused and on_tpu) else 0
        fe_prec = cfg.frontend_precision
        if fe_prec == "auto":
            fe_prec = "bf16" if (use_fused and on_tpu) else "highest"
        fe_rows = cfg.frontend_rows
        if fe_rows == 0:
            fe_rows = 64 if C_ >= 4096 else 128 if C_ >= 2048 else 256
        return use_fused, interp, fe_bu, fe_prec, fe_rows

    def block_batch_cl(self, xT: CF32, state: DemodState):
        """Channels-last ingest: `(T, C)` CF32 block -> (soft, valid,
        state), identical results to `block_batch(transpose(xT))` without
        the device-side input transpose.  Time-major is the natural wire
        order of an interleaved multichannel source, and the fused
        front-end kernel consumes `(T, C)` directly — at C=2048 the
        skipped `(C, T) -> (T, C)` transpose is ~4 GB of HBM traffic per
        131072-sample block.  Falls back to `block_batch` (one transpose)
        when the fused-path prerequisites don't hold."""
        T_, C_ = xT.re.shape
        use_fused, interp, fe_bu, fe_prec, fe_rows = self._resolve_fused(
            C_, T_
        )
        if not use_fused or self.config.decimation > 1:
            x = CF32(jnp.swapaxes(xT.re, 0, 1), jnp.swapaxes(xT.im, 0, 1))
            return self.block_batch(x, state)
        expect = self.block_len // self.config.decimation
        if T_ != expect:
            raise ValueError(
                f"block_batch_cl got {T_} samples; this Demodulator was "
                f"built for block_len={self.block_len} (-> {expect})"
            )
        return self._fused_cl(
            xT, state.dec_hist, state, interp, fe_bu, fe_prec, fe_rows
        )

    def block_batch(self, x: CF32, state: DemodState):
        """`(C, T)` CF32 block with `(C,)`-leading state: the throughput
        path.  The FIR/AGC/Costas ops batch natively over leading dims; the
        clock recovery uses the channels-in-lanes batch kernel (identical
        math to vmap of `_block`, far faster on TPU)."""
        cfg = self.config
        if cfg.decimation > 1:
            x, dec_hist = fir.fir_block(
                x, self._dec_taps, state.dec_hist, cfg.decimation
            )
        else:
            dec_hist = state.dec_hist
        on_tpu = jax.default_backend() == "tpu"
        C_, T_ = x.re.shape
        # num_slots (and the clock segmentation) were budgeted from
        # block_len at construction; a different post-decimation length
        # would silently drop samples in the segment split.
        expect = self.block_len // cfg.decimation
        if T_ != expect:
            raise ValueError(
                f"block_batch got {T_} post-decimation samples; this "
                f"Demodulator was built for block_len={self.block_len} "
                f"(-> {expect})"
            )
        stream_ok = on_tpu and C_ % 128 == 0 and T_ % 256 == 0
        # Resolution notes: the auto (-1) slab size is K=8 inside the
        # fused TPU kernel (measured optimum), exact per-sample forms
        # elsewhere (incl. forced-fused interpret runs on CPU, which the
        # tests compare bit-for-bit against the exact split path).
        use_fused, interp, fe_bu, fe_prec, fe_rows = self._resolve_fused(
            C_, T_
        )
        if use_fused:
            xT = CF32(jnp.swapaxes(x.re, 0, 1), jnp.swapaxes(x.im, 0, 1))
            return self._fused_cl(
                xT, dec_hist, state, interp, fe_bu, fe_prec, fe_rows
            )
        if cfg.agc_kernel == "pallas" or (
            cfg.agc_kernel == "auto" and stream_ok
        ):
            from xritdemod_tpu.ops.stream_pallas import agc_block_pallas

            x, agc_gain = agc_block_pallas(
                x, state.agc_gain, self._agc, interpret=interp
            )
        else:
            x, agc_gain = agc_op.agc_block(x, state.agc_gain, self._agc)
        x, rrc_hist = fir.fir_block(
            x, self._rrc_taps, state.rrc_hist,
            method=self._fir_method(x.re.shape[-1]),
        )
        if cfg.costas_kernel == "pallas" or (
            cfg.costas_kernel == "auto" and stream_ok
        ):
            from xritdemod_tpu.ops.stream_pallas import costas_block_pallas

            x, costas_state = costas_block_pallas(
                x, state.costas, self._costas, interpret=interp
            )
        elif fe_bu:
            x, costas_state = costas_op.costas_block_update(
                x, state.costas, self._costas,
                chunk=fe_bu,
            )
        else:
            x, costas_state = costas_op.costas_block(
                x, state.costas, self._costas
            )
        use_pallas = cfg.clock_kernel == "pallas" or (
            cfg.clock_kernel == "auto"
            and on_tpu
            and x.re.shape[0] % 128 == 0
        )
        if use_pallas:
            from xritdemod_tpu.ops.clock_pallas import (
                clock_recovery_block_pallas_batch,
            )

            ck_kw = self._clock_pallas_kw(interp, x.re.shape[0])

            # Same chained-segment split as the fused path (the kernel's
            # window scratch grows with block length — clock_max_block).
            def run_seg(start, rows, slots, cstate):
                xs = CF32(x.re[:, start:start + rows],
                          x.im[:, start:start + rows])
                s_i, v_i, cstate = clock_recovery_block_pallas_batch(
                    xs, cstate, self._clock, slots,
                    interpret=interp, **ck_kw,
                )
                return s_i.re, v_i, cstate

            soft, valid, clock_state = self._run_clock_segs(
                run_seg, T_, state.clock
            )
            return soft, valid, DemodState(
                dec_hist=dec_hist,
                agc_gain=agc_gain,
                rrc_hist=rrc_hist,
                costas=costas_state,
                clock=clock_state,
            )
        elif cfg.clock_block_update:
            syms, valid, clock_state = cr_op.clock_recovery_block_update_batch(
                x, state.clock, self._clock, self.num_slots,
                chunk=cfg.clock_block_update,
                interp=cfg.clock_interp,
            )
        else:
            syms, valid, clock_state = cr_op.clock_recovery_block_batch(
                x, state.clock, self._clock, self.num_slots,
                interp=cfg.clock_interp,
            )
        soft = syms.re
        new_state = DemodState(
            dec_hist=dec_hist,
            agc_gain=agc_gain,
            rrc_hist=rrc_hist,
            costas=costas_state,
            clock=clock_state,
        )
        return soft, valid, new_state


def quantize_symbols(soft: jax.Array) -> jax.Array:
    """float soft symbols -> int8 wire format (SymbolManager.cpp:43-46)."""
    q = jnp.clip(soft * C.SYMBOL_SCALE, -128.0, 127.0)
    return q.astype(jnp.int8)
