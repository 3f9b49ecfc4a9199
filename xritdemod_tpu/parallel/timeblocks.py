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

__all__ = ["TimeBlockDemodulator"]


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
    ):
        if config.decimation != 1:
            raise NotImplementedError(
                "time-block sharding currently assumes decimation == 1"
            )
        self.config = config
        self.mesh = mesh
        self.axis = axis
        self.block_len = block_len
        self.warmup = warmup
        self.n_devices = mesh.shape[axis]
        self._demod = Demodulator(config, block_len=warmup + block_len)
        self.num_slots = self._demod.num_slots

        spec = P(axis)
        self._x_sharding = NamedSharding(mesh, spec)

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
            halo_r = jax.lax.ppermute(xr[-warmup:], axis, perm)
            halo_i = jax.lax.ppermute(xi[-warmup:], axis, perm)
            idx = jax.lax.axis_index(axis)
            # Device 0 has no left context; zero halo = cold start like the
            # reference's own stream head.
            halo_r = jnp.where(idx == 0, 0.0, halo_r)
            halo_i = jnp.where(idx == 0, 0.0, halo_i)
            ext = CF32(
                jnp.concatenate([halo_r, xr]), jnp.concatenate([halo_i, xi])
            )
            soft, valid, _ = self._demod._block(ext, self._demod.init_state())
            # Mask out symbols recovered from the warm-up halo region: the
            # clock walks ~omega samples per symbol from position 0.
            nwarm = int(warmup / config.sps) + 2
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
