"""Time-block parallel demodulation: one long capture sharded over a mesh.

The reference is strictly serial in time — one sample stream through one
thread (SURVEY.md §2d).  The TPU analog of sequence parallelism here splits
a long capture into contiguous time blocks, one per device, and runs the
demod chain on all blocks simultaneously:

  - FIR stages are windowed (overlap-save): each device fetches a halo of
    trailing samples from its left neighbour over ICI with `ppermute`
    inside `shard_map` — the collective replacement for the reference's
    intra-process buffer carry (demodulator.cpp:94-98).
  - The feedback loops (AGC gain, Costas phase/freq, M&M mu/omega) are
    inherently serial, but converge to quasi-steady state in O(1/alpha)
    samples; each device warm-starts them by running the chain over its
    halo region first and discarding that output (acquisition pass ->
    parallel refinement, SURVEY.md §5).  The per-boundary cost is a short
    re-lock transient, recovered downstream by the frame-sync correlator
    exactly as the reference recovers from any stream gap
    (newdecoder.cpp:218-237).

`warmup` sets the halo length in samples; with the shipped loop bandwidths
(alpha = 0.0037) a few thousand samples reconverge both loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
from xritdemod_tpu.utils.cplx import CF32

__all__ = ["TimeBlockDemodulator", "FoldedCaptureReceiver"]


class TimeBlockDemodulator:
    """Shard one `(T_total,)` capture as D contiguous time blocks.

    `process(x)` expects `T_total == n_devices * block_len` and returns
    `(soft, valid)` where device d's symbols cover samples
    `[d*block_len, (d+1)*block_len)`; the first symbols of each block after
    block 0 are re-acquisition transients (valid marks slot occupancy, not
    lock quality).
    """

    def __init__(
        self,
        config: DemodConfig,
        mesh: Mesh,
        block_len: int = 1 << 20,
        warmup: int = 8192,
        axis: str = "t",
        decode_overlap: int = 0,
    ):
        """`decode_overlap` extends the left halo beyond `warmup` by that
        many samples which are KEPT (not masked): each device then re-emits
        the tail of its left neighbour's stream, so frames spanning a block
        seam are decoded by BOTH devices and survive via (vcid, counter)
        dedup — the lossless seam policy of FoldedCaptureReceiver, here
        over the ppermute halo.  Size it >= 2 coded-frame spans
        (2 * 16384 * sps * decimation samples) for zero seam loss."""
        if (block_len % config.decimation or warmup % config.decimation
                or decode_overlap % config.decimation):
            raise ValueError(
                "block_len/warmup/decode_overlap must be multiples of "
                "decimation"
            )
        self.config = config
        self.mesh = mesh
        self.axis = axis
        self.block_len = block_len
        self.warmup = warmup
        self.decode_overlap = decode_overlap
        self.n_devices = mesh.shape[axis]
        halo = warmup + decode_overlap
        self._halo = halo
        self._demod = Demodulator(config, block_len=halo + block_len)
        self.num_slots = self._demod.num_slots

        spec = P(axis)
        self._x_sharding = NamedSharding(mesh, spec)
        halo = self._halo

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(spec,),
            out_specs=(spec, spec),
            check_vma=False,
        )
        def step(xr_blocks):
            xr, xi = xr_blocks  # each (1, block_len) per device after shard
            xr = xr.reshape(-1)
            xi = xi.reshape(-1)
            n = self.n_devices
            # Left-halo exchange: device d receives the tail of device d-1.
            perm = [(i, (i + 1) % n) for i in range(n)]
            halo_r = jax.lax.ppermute(xr[-halo:], axis, perm)
            halo_i = jax.lax.ppermute(xi[-halo:], axis, perm)
            idx = jax.lax.axis_index(axis)
            # Device 0 has no left context; zero halo = cold start like the
            # reference's own stream head.
            halo_r = jnp.where(idx == 0, 0.0, halo_r)
            halo_i = jnp.where(idx == 0, 0.0, halo_i)
            ext = CF32(
                jnp.concatenate([halo_r, xr]), jnp.concatenate([halo_i, xi])
            )
            soft, valid, _ = self._demod._block(ext, self._demod.init_state())
            # Mask out symbols recovered from the warm-up (pull-in) region:
            # the clock walks ~omega post-decimation samples per symbol.
            # Symbols from the decode_overlap region are KEPT — they
            # duplicate the left neighbour's tail for seam dedup.
            nwarm = int(warmup / config.decimation / config.sps) + 2
            slot = jnp.arange(soft.shape[-1])
            keep = slot >= nwarm
            return (
                jnp.where(keep, soft, 0.0)[None, :],
                (valid & keep)[None, :],
            )

        self._step = jax.jit(step)

    def process(self, x: CF32):
        """`(n_devices * block_len,)` CF32 -> (soft, valid) `(D, slots)`."""
        total = self.n_devices * self.block_len
        assert x.re.shape[-1] == total, (x.re.shape, total)
        xr = jax.device_put(
            x.re.reshape(self.n_devices, self.block_len), self._x_sharding
        )
        xi = jax.device_put(
            x.im.reshape(self.n_devices, self.block_len), self._x_sharding
        )
        return self._step((xr, xi))


class FoldedCaptureReceiver:
    """Single-chip bulk reprocessing of ONE long recorded capture at
    channel-batch speed: the fold-parallel analog of TimeBlockDemodulator.

    The reference replays a capture strictly serially at whatever rate one
    core sustains (CFileFrontend.cpp:33-62 paces it to *real time*).  Here
    the capture is folded into `folds` overlapping time segments that run
    through the batched demod chain as if they were independent channels —
    so one chip applies its full channel-parallel throughput (the Pallas
    front-end + clock kernels at folds % 128 == 0) to a single stream.

    Correctness at the fold seams: each fold (after the first) starts
    `overlap` samples inside its left neighbour's segment, where
    `overlap >= warmup + 2 coded-frame spans`.  The warmup re-locks the
    feedback loops (AGC/Costas/M&M) from cold exactly as the reference
    re-locks after any stream gap; the remaining >= 2 frame spans are
    decoded by BOTH neighbouring folds, and the duplicates are dropped by
    (vcid, counter) identity — so no frame is lost at a seam as long as
    re-lock succeeds within the warmup (guaranteed by the loop bandwidths:
    O(1/alpha) ~ 3k samples; default warmup 16384).

    Per-fold symbol streams are decoded by independent StreamDecoders
    (each re-acquires frame sync from its own junk-prefixed stream, the
    always-on correlator replacing the reference's flywheel).
    """

    def __init__(
        self,
        config: DemodConfig,
        folds: int = 128,
        block_len: int = 1 << 17,
        warmup: int | None = None,
        frames_per_block: int = 32,
        mode: str | None = None,
        use_fused: bool | None = None,
        max_clock_ppm: float = 100.0,
    ):
        from xritdemod_tpu import constants as C
        from xritdemod_tpu.models.decoder import DecoderConfig

        if warmup is None:
            # Cold-start pull-in is dominated by the M&M omega loop and
            # grows ~quadratically with the capture's symbol-clock offset
            # (measured: ~4.4k samples at 0 ppm, ~13k at 100 ppm, ~200k at
            # 500 ppm).  The default covers max_clock_ppm=100 — 2x a bad
            # RTL dongle crystal; raise it for worse hardware.  The
            # reference never cold-starts mid-stream (strictly serial), so
            # this bound is a fold-parallelism artifact, priced here.
            warmup = max(16384, int(16384 + 0.9 * max_clock_ppm**2))
            warmup = -(-warmup // config.decimation) * config.decimation
        if block_len % config.decimation or warmup % config.decimation:
            raise ValueError(
                "block_len and warmup must be multiples of decimation"
            )
        self.config = config
        self.folds = folds
        self.block_len = block_len
        self.warmup = warmup
        if mode is None:
            mode = "lrit" if config.symbol_rate == C.LRIT_SYMBOL_RATE else "hrit"
        self.mode = mode
        self._dec_cfg = DecoderConfig(
            mode=mode, frames_per_block=frames_per_block
        )
        # use_fused routes the whole receive through the on-device
        # FusedReceiver (models/receiver.py): demod -> symbol ring ->
        # decode with no host symbol hop — the bulk-reprocess fast path.
        # Auto: on for TPU, off for CPU (where the interpret-mode ring
        # kernels would dominate).
        if use_fused is None:
            import jax

            use_fused = jax.default_backend() == "tpu"
        self.use_fused = use_fused
        # Overlap is in RAW capture samples: one coded frame spans
        # sps post-decimation samples per symbol x decimation.
        frame_span = int(C.CODED_FRAME_SIZE * config.sps * config.decimation) + 1
        self.overlap = warmup + 2 * frame_span
        self._demod = Demodulator(config, block_len=block_len)
        self.last_timings: dict = {}   # filled by the fused path

    def _get_rx(self):
        """The FusedReceiver is shape-static; build once and reuse (so a
        `warm_jit` compile carries over to `process`)."""
        if getattr(self, "_rx", None) is None:
            from xritdemod_tpu.models.receiver import FusedReceiver

            self._rx = FusedReceiver(
                self.config, self._dec_cfg, channels=self.folds,
                block_len=self.block_len,
            )
        return self._rx

    def warm_jit(self, wire: str = "s8") -> float:
        """Compile the fused step ahead of streaming (one zero block of the
        production shapes + a sync), like any serving system's warmup.
        Returns the wall seconds spent; no-op on the non-fused path."""
        import time

        import numpy as np

        if not self.use_fused:
            return 0.0
        t0 = time.perf_counter()
        rx = self._get_rx()
        st = rx.init_state()
        if wire == "s8":
            batch, _, _, _ = rx.step_int8(
                np.zeros((self.folds, 2 * self.block_len), np.int8), st
            )
        else:
            batch, _, _, _ = rx.step(
                np.zeros((self.folds, self.block_len), np.complex64), st
            )
        _ = float(np.asarray(batch.corr[0, 0]))   # sync (D2H, see skill)
        return time.perf_counter() - t0

    def _fold_starts(self, N: int):
        import numpy as np

        F, T = self.folds, self.block_len
        seg = -(-N // F)          # segment length per fold (ceil)
        L = seg + self.overlap
        nblocks = -(-L // T)
        starts = np.arange(F, dtype=np.int64) * seg - self.overlap
        return starts, nblocks

    def _fold_block(self, x, starts, j, buf, width: int = 1):
        """Assemble fold block j into `buf`.  `width` = elements per
        sample (1 for complex64 rows, 2 for interleaved int8 I/Q)."""
        N = len(x) // width
        T = self.block_len
        buf[:] = 0
        for f in range(self.folds):
            s0 = starts[f] + j * T
            s1 = s0 + T
            c0, c1 = max(s0, 0), min(s1, N)
            if c1 > c0:
                buf[f, width * (c0 - s0) : width * (c1 - s0)] = (
                    x[width * c0 : width * c1]
                )
        return buf

    @staticmethod
    def _dedup(per_fold) -> list[tuple[int, int, int, bytes]]:
        out: list[tuple[int, int, int, bytes]] = []
        seen: set[tuple[int, int]] = set()
        for frames in per_fold:
            for scid, vcid, ctr, vcdu in frames:
                key = (vcid, ctr)
                if key in seen:
                    continue
                seen.add(key)
                out.append((scid, vcid, ctr, vcdu))
        return out

    def _process_fused(self, x, starts, nblocks):
        """The on-device path: every block steps the FusedReceiver; a few
        trailing zero blocks flush the last ring-buffered frames (their
        junk tail fails the per-frame sync recheck and is dropped).

        Host discipline (the round-4 LONGRUN budget breakdown): results
        stay ON DEVICE as per-block handles and come back as ONE stacked
        transfer per field at the end — per-block `np.asarray` pays the
        host<->TPU link's per-transfer latency floor x 5 fields x
        hundreds of blocks, which (with the f32 input transfer) is what
        held the round-3 soak to 0.7x real time while the chip itself ran
        ~1900x.  int8 captures additionally cross the link at 1/4 the
        bytes and dequantize on device (FusedReceiver.step_int8)."""
        import time

        import jax
        import jax.numpy as jnp
        import numpy as np

        from xritdemod_tpu.models.receiver import FusedReceiver

        F, T = self.folds, self.block_len
        int8_wire = np.asarray(x).dtype == np.int8
        rx = self._get_rx()
        st = rx.init_state()
        saved = []
        buf = (
            np.zeros((F, 2 * T), np.int8)
            if int8_wire
            else np.zeros((F, T), np.complex64)
        )
        t_assemble = 0.0
        t0 = time.perf_counter()
        for j in range(nblocks + 2):
            ta = time.perf_counter()
            if j < nblocks:
                self._fold_block(x, starts, j, buf, 2 if int8_wire else 1)
            else:
                buf[:] = 0                      # flush pass
            t_assemble += time.perf_counter() - ta
            if int8_wire:
                batch, ok, ovf, st = rx.step_int8(buf, st)
            else:
                xc = CF32(
                    jnp.asarray(buf.real.copy()), jnp.asarray(buf.imag.copy())
                )
                batch, ok, ovf, st = rx.step(xc, st)
            saved.append(
                (batch.frame_ok, batch.scid, batch.vcid, batch.counter,
                 batch.vcdu)
            )
            if j == 0:
                # One-element pull = the only reliable sync on this
                # backend: isolates the one-time jit compile (persistent
                # cache makes later runs ~1s) from steady-state streaming.
                _ = float(np.asarray(batch.corr[0, 0]))
                t_compile = time.perf_counter() - t0
        t_stream0 = time.perf_counter()
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *saved)
        okh, scid, vcid, ctr, vcdu = (np.asarray(a) for a in stacked)
        t_pull = time.perf_counter() - t_stream0
        self.last_timings = {
            # first block step incl. the one-time jit compile
            "first_block_s": round(t_compile, 2),
            # host-side fold memcpy across all blocks
            "assemble_s": round(t_assemble, 2),
            # drain the queued device work + ONE stacked D2H per field
            "stream_and_pull_s": round(t_pull, 2),
            "blocks": nblocks,
            "wire": "s8" if int8_wire else "f32",
        }
        per_fold: list[list] = [[] for _ in range(F)]
        # nonzero is row-major (j, f, k): within each fold the appends are
        # stream-ordered, which _dedup relies on.
        for j, f, k in zip(*np.nonzero(okh)):
            per_fold[f].append(
                (int(scid[j, f, k]), int(vcid[j, f, k]), int(ctr[j, f, k]),
                 bytes(vcdu[j, f, k]))
            )
        return self._dedup(per_fold)

    def process(self, x: "np.ndarray") -> list[tuple[int, int, int, bytes]]:
        """Capture -> deduplicated (scid, vcid, counter, vcdu) in stream
        order.  Accepts complex64 samples OR the `(2N,)` interleaved int8
        I/Q wire format (`utils.cplx.quantize_iq_s8`); int8 captures cross
        the host->device link quantized on the fused path (1/4 the bytes)
        and are dequantized on the host for the CPU fallback."""
        import numpy as np

        from xritdemod_tpu.models.decoder import StreamDecoder

        x = np.asarray(x)
        int8_wire = x.dtype == np.int8
        if int8_wire and x.ndim == 2:          # (N, 2) -> interleaved
            x = x.reshape(-1)
        if not int8_wire:
            x = np.asarray(x, np.complex64)
        N = len(x) // 2 if int8_wire else len(x)
        F, T = self.folds, self.block_len
        starts, nblocks = self._fold_starts(N)
        if self.use_fused:
            return self._process_fused(x, starts, nblocks)
        if int8_wire:
            from xritdemod_tpu.utils.cplx import IQ_S8_SCALE

            f = x.astype(np.float32) / np.float32(IQ_S8_SCALE)
            x = (f[0::2] + 1j * f[1::2]).astype(np.complex64)

        state = self._demod.init_state_batch(F)
        decoders = [StreamDecoder(self._dec_cfg) for _ in range(F)]
        batches: list[list] = [[] for _ in range(F)]

        buf = np.zeros((F, T), np.complex64)
        for j in range(nblocks):
            buf[:] = 0
            for f in range(F):
                s0 = starts[f] + j * T
                s1 = s0 + T
                c0, c1 = max(s0, 0), min(s1, N)
                if c1 > c0:
                    buf[f, c0 - s0 : c1 - s0] = x[c0:c1]
            xc = CF32(
                jnp.asarray(buf.real.copy()), jnp.asarray(buf.imag.copy())
            )
            soft, valid, state = self._demod.block_batch(xc, state)
            soft_h = np.asarray(soft)
            valid_h = np.asarray(valid)
            for f in range(F):
                batches[f].append(
                    decoders[f].push(soft_h[f][valid_h[f]])
                )
        out: list[tuple[int, int, int, bytes]] = []
        seen: set[tuple[int, int]] = set()
        for f in range(F):
            batches[f].append(decoders[f].flush())
            for blist in batches[f]:
                for b in blist:
                    ok = np.asarray(b.frame_ok)
                    vcid = np.asarray(b.vcid)
                    ctr = np.asarray(b.counter)
                    scid = np.asarray(b.scid)
                    vcdu = np.asarray(b.vcdu)
                    for i in range(len(ok)):
                        if not ok[i]:
                            continue
                        key = (int(vcid[i]), int(ctr[i]))
                        if key in seen:
                            continue
                        seen.add(key)
                        out.append(
                            (int(scid[i]), int(vcid[i]), int(ctr[i]),
                             bytes(vcdu[i]))
                        )
        return out
