"""Channel-parallel receive: many IQ streams batched and sharded over chips.

The reference processes exactly one stream per process pair
(SURVEY.md §2d); its only concurrency is threads and sockets.  The TPU
analog of data parallelism here is *channel parallelism*: the demod chain is
already written over `(..., T)` blocks, so C independent streams are one
`vmap`, and a 1-D device mesh shards the channel axis with `shard_map` —
every channel's feedback-loop state stays on its own device, so there are
no collectives at all on this axis (embarrassingly parallel, the ideal DP).

The decode stage shards the same way over aligned coded-symbol blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xritdemod_tpu.models.decoder import CaduDecoder, DecoderConfig
from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator, DemodState
from xritdemod_tpu.ops import clock_recovery as cr_op
from xritdemod_tpu.utils.cplx import CF32

__all__ = ["ChannelDemodulator", "ChannelReceiver", "make_channel_mesh"]


def make_channel_mesh(devices=None, axis: str = "ch") -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


class ChannelDemodulator:
    """`(C, T)` block demod: vmap over channels, sharded over a mesh axis.

    With `mesh=None` runs as a plain vmap on one device (still batched —
    this is also the single-chip throughput path used by bench.py).
    """

    def __init__(
        self,
        config: DemodConfig,
        channels: int,
        block_len: int = 1 << 17,
        mesh: Mesh | None = None,
        axis: str = "ch",
    ):
        self.config = config
        self.channels = channels
        self.block_len = block_len
        self.mesh = mesh
        self.axis = axis
        self._demod = Demodulator(config, block_len)
        self.num_slots = self._demod.num_slots

        # Batch-native path (channels-in-lanes clock kernel); identical
        # math to jax.vmap(self._demod._block) but far faster on TPU.
        step = self._demod.block_batch
        if mesh is not None:
            spec = P(axis)
            shardings = NamedSharding(mesh, spec)
            self._sharding = shardings
            self._step = jax.jit(
                jax.shard_map(
                    step,
                    mesh=mesh,
                    in_specs=(spec, spec),
                    out_specs=(spec, spec, spec),
                    check_vma=False,
                )
            )
        else:
            self._sharding = None
            self._step = jax.jit(step)

    def init_state(self) -> DemodState:
        state = self._demod.init_state_batch(self.channels)
        if self._sharding is not None:
            state = jax.device_put(state, self._sharding)
        return state

    def process(self, x: CF32, state: DemodState):
        """`(C, T)` CF32 block -> (soft (C, S), valid (C, S), state)."""
        if self._sharding is not None:
            x = jax.device_put(x, self._sharding)
        return self._step(x, state)


class ChannelReceiver:
    """Fused channel-parallel receive: demod `(C, T)` + decode `(C, B*16384)`.

    The decode input is the aligned coded-symbol stream per channel (frame
    alignment is per-channel host state, as in models.decoder.StreamDecoder);
    both stages shard over the same channel mesh axis.
    """

    def __init__(
        self,
        demod_config: DemodConfig,
        decoder_config: DecoderConfig,
        channels: int,
        block_len: int = 1 << 17,
        mesh: Mesh | None = None,
        axis: str = "ch",
    ):
        self.demod = ChannelDemodulator(
            demod_config, channels, block_len, mesh=mesh, axis=axis
        )
        self._decoder = CaduDecoder(decoder_config)
        self.channels = channels
        dec_step = jax.vmap(self._decoder._decode)
        if mesh is not None:
            spec = P(axis)
            self._dec_sharding = NamedSharding(mesh, spec)
            self._dec_step = jax.jit(
                jax.shard_map(
                    dec_step,
                    mesh=mesh,
                    in_specs=(spec, spec),
                    out_specs=(spec, spec),
                    check_vma=False,
                )
            )
        else:
            self._dec_sharding = None
            self._dec_step = jax.jit(dec_step)

    def init_demod_state(self):
        return self.demod.init_state()

    def init_tails(self) -> jax.Array:
        t = jnp.zeros((self.channels, 64), jnp.float32)
        if self._dec_sharding is not None:
            t = jax.device_put(t, self._dec_sharding)
        return t

    def demod_block(self, x: CF32, state):
        return self.demod.process(x, state)

    def decode_block(self, soft: jax.Array, tails: jax.Array):
        """`(C, B*16384)` aligned soft symbols -> (FrameBatch with leading
        channel dim, new tails)."""
        if self._dec_sharding is not None:
            soft = jax.device_put(soft, self._dec_sharding)
        return self._dec_step(soft, tails)
