"""Multi-host distributed receive: `jax.distributed` runtime + (hosts, chips)
mesh.

The reference's only inter-node transport is raw TCP between its two
processes (/root/reference/demodulator/src/SymbolManager.cpp:57,
/root/reference/decoder/src/newdecoder.cpp:188).  The TPU-native replacement
(SURVEY.md §2d rows 5-6) is a `jax.distributed` process group over a
`(hosts, chips)` device mesh:

  - **Channel parallelism** shards independent IQ streams over every chip of
    every host with ZERO collectives — each channel's feedback-loop state
    lives on its own device, so multi-host channel receive is exactly
    single-host channel receive plus per-process data feeding
    (`jax.make_array_from_process_local_data`) and per-process result reads
    (`addressable_shards`).  Cross-host traffic: none.
  - **Time-block parallelism** splits one capture over all devices of all
    hosts; the FIR halo exchange (`ppermute` in parallel/timeblocks.py) rides
    ICI between chips of one host and DCN between hosts — the collective
    replacement for the reference's socket hop.

Single-process operation degrades gracefully: `initialize()` is a no-op
without a coordinator, `make_host_mesh()` returns a (1, n_local) mesh, and
the receivers behave exactly like their parallel/channels.py twins (pinned
by tests/test_parallel.py; the multi-process path is pinned by
tests/test_distributed.py, which runs two real `jax.distributed` CPU
processes with gloo collectives).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xritdemod_tpu.models.decoder import CaduDecoder, DecoderConfig
from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
from xritdemod_tpu.utils.cplx import CF32

__all__ = [
    "initialize",
    "make_host_mesh",
    "DistributedChannelReceiver",
    "DistributedTimeBlockDemodulator",
    "DistributedFusedReceiver",
]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Join (or auto-detect) a `jax.distributed` process group.

    With no arguments, relies on cluster auto-detection (TPU pod metadata /
    the JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID env
    vars); explicit arguments override.  On the CPU backend the gloo
    collectives implementation is enabled so ppermute/psum work across
    processes (the DCN stand-in used by the 2-process tests).

    Returns True if a multi-process group is active after the call.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # NB: jax.distributed.initialize must run before ANY backend-touching
    # call (jax.devices/process_count/default_backend all initialize XLA),
    # so the checks here stay backend-free.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if coordinator_address is None:
        return False

    platforms = jax.config.jax_platforms or ""
    if platforms.startswith("cpu"):
        # gloo collectives make ppermute/psum work across CPU processes
        # (the DCN stand-in used by the 2-process tests).
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count() > 1


def make_host_mesh(axes: tuple[str, str] = ("host", "chip")) -> Mesh:
    """(hosts, chips-per-host) mesh over every device of every process.

    Row h holds process h's local devices, so `P(axes)` sharding keeps a
    contiguous slab of the leading array dimension on each host — the
    layout both receivers below rely on for local feed/read.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    nh = jax.process_count()
    nl = len(devs) // nh
    if nh * nl != len(devs):
        raise ValueError(
            f"{len(devs)} devices do not split evenly over {nh} processes"
        )
    return Mesh(np.asarray(devs).reshape(nh, nl), axes)


def _to_global(sharding: NamedSharding, local: np.ndarray) -> jax.Array:
    """Per-process local rows -> one global sharded array."""
    return jax.make_array_from_process_local_data(sharding, local)


def _to_local(arr: jax.Array) -> np.ndarray:
    """This process's contiguous rows of a dim-0-sharded global array."""
    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


class DistributedChannelReceiver:
    """Channel-parallel demod + CADU decode over a (hosts, chips) mesh.

    Every process feeds `channels_per_device * chips_per_host` channels of
    `(C_local, T)` IQ and reads back only those channels' soft symbols /
    frames; the device step is the same shard_map'd block step as
    parallel/channels.py (bit-identical math), sharded over BOTH mesh axes.
    """

    def __init__(
        self,
        demod_config: DemodConfig,
        decoder_config: DecoderConfig | None = None,
        channels_per_device: int = 1,
        block_len: int = 1 << 17,
        mesh: Mesh | None = None,
    ):
        self.mesh = mesh if mesh is not None else make_host_mesh()
        axes = tuple(self.mesh.axis_names)
        self.spec = P(axes)
        self.sharding = NamedSharding(self.mesh, self.spec)
        self.n_hosts = self.mesh.shape[axes[0]]
        self.n_local = self.mesh.shape[axes[1]]
        self.channels = channels_per_device * self.mesh.size
        self.channels_local = channels_per_device * self.n_local
        self.block_len = block_len

        self._demod = Demodulator(demod_config, block_len)
        self.num_slots = self._demod.num_slots
        self._demod_step = jax.jit(
            jax.shard_map(
                self._demod.block_batch,
                mesh=self.mesh,
                in_specs=(self.spec, self.spec),
                out_specs=(self.spec, self.spec, self.spec),
                check_vma=False,
            )
        )
        self._decoder = None
        if decoder_config is not None:
            self._decoder = CaduDecoder(decoder_config)
            self._dec_step = jax.jit(
                jax.shard_map(
                    jax.vmap(self._decoder._decode),
                    mesh=self.mesh,
                    in_specs=(self.spec, self.spec),
                    out_specs=(self.spec, self.spec),
                    check_vma=False,
                )
            )

    # -- demod ------------------------------------------------------------
    def init_demod_state(self):
        local = self._demod.init_state_batch(self.channels_local)
        # Every state leaf is (C_local, ...); dim 0 shards over both mesh
        # axes, trailing dims replicate.
        return jax.tree.map(
            lambda a: _to_global(self.sharding, np.asarray(a)), local
        )

    def demod_block(self, x_local, state):
        """`(C_local, T)` CF32/numpy IQ for THIS process -> local
        `(C_local, slots)` (soft, valid) numpy + the carried global state."""
        if isinstance(x_local, CF32):
            re, im = np.asarray(x_local.re), np.asarray(x_local.im)
        else:
            x_local = np.asarray(x_local)
            re, im = (
                x_local.real.astype(np.float32),
                x_local.imag.astype(np.float32),
            )
        xg = CF32(
            _to_global(self.sharding, re), _to_global(self.sharding, im)
        )
        soft, valid, state = self._demod_step(xg, state)
        return _to_local(soft), _to_local(valid), state

    # -- decode -----------------------------------------------------------
    def init_tails(self):
        t = np.zeros((self.channels_local, 64), np.float32)
        return _to_global(self.sharding, t)

    def decode_block(self, soft_local: np.ndarray, tails):
        """`(C_local, B*16384)` aligned soft symbols for THIS process ->
        (local FrameBatch as numpy pytree, new global tails)."""
        if self._decoder is None:
            raise ValueError("constructed without a decoder_config")
        sg = _to_global(
            self.sharding, np.asarray(soft_local, np.float32)
        )
        batch, tails = self._dec_step(sg, tails)
        return jax.tree.map(_to_local, batch), tails


class DistributedTimeBlockDemodulator:
    """One long capture time-block sharded over every device of every host.

    The (hosts, chips) mesh is flattened into a single time axis ordered
    host-major, so the `ppermute` halo exchange of parallel/timeblocks.py
    crosses the host boundary exactly once per neighbouring pair — ICI
    within a host, DCN between hosts.  Each process feeds its own
    contiguous `(n_local * block_len,)` sample range.
    """

    def __init__(
        self,
        config: DemodConfig,
        block_len: int = 1 << 17,
        warmup: int = 8192,
        mesh: Mesh | None = None,
        decode_overlap: int = 0,
    ):
        """`decode_overlap` (parallel/timeblocks.py semantics) extends the
        ppermute halo by symbols that are KEPT, so frames spanning a block
        seam — including the host/DCN boundary — are decoded by both
        neighbours and deduped by (vcid, counter): the lossless seam
        policy, here with the duplicate stream crossing processes."""
        from xritdemod_tpu.parallel.timeblocks import TimeBlockDemodulator

        host_mesh = mesh if mesh is not None else make_host_mesh()
        devs = host_mesh.devices.reshape(-1)
        self.mesh = Mesh(devs, ("t",))
        self.n_devices = len(devs)
        self.n_local = len(devs) // jax.process_count()
        self.block_len = block_len
        self._tb = TimeBlockDemodulator(
            config, self.mesh, block_len=block_len, warmup=warmup,
            decode_overlap=decode_overlap,
        )
        self.num_slots = self._tb.num_slots
        self._sharding = NamedSharding(self.mesh, P("t"))

    def process_local(self, x_local) -> tuple[np.ndarray, np.ndarray]:
        """`(n_local * block_len,)` complex/CF32 samples owned by THIS
        process (host h owns samples
        `[h * n_local * block_len, (h+1) * n_local * block_len)`) ->
        this host's `(n_local, slots)` (soft, valid) numpy."""
        if isinstance(x_local, CF32):
            re, im = np.asarray(x_local.re), np.asarray(x_local.im)
        else:
            x_local = np.asarray(x_local)
            re = x_local.real.astype(np.float32)
            im = x_local.imag.astype(np.float32)
        shape = (self.n_local, self.block_len)
        xr = _to_global(self._sharding, re.reshape(shape))
        xi = _to_global(self._sharding, im.reshape(shape))
        soft, valid = self._tb._step((xr, xi))
        return _to_local(soft), _to_local(valid)


class DistributedFusedReceiver:
    """The flagship fused on-device receive (models/receiver.FusedReceiver:
    IQ -> symbol ring -> sync -> FEC, no host symbol hop), channel-sharded
    over a (hosts, chips) mesh.

    Every device runs the complete fused step on its own channel slab —
    ring/lock/tail state never crosses devices, so this axis needs zero
    collectives; each process feeds and reads only its local channels.
    """

    def __init__(
        self,
        demod_config,
        decoder_config,
        channels_per_device: int = 128,
        block_len: int = 1 << 17,
        mesh: Mesh | None = None,
        **rx_kwargs,
    ):
        from xritdemod_tpu.models.receiver import FusedReceiver

        self.mesh = mesh if mesh is not None else make_host_mesh()
        axes = tuple(self.mesh.axis_names)
        self.spec = P(axes)
        self.sharding = NamedSharding(self.mesh, self.spec)
        nl = self.mesh.shape[axes[1]]
        self.channels = channels_per_device * self.mesh.size
        self.channels_local = channels_per_device * nl
        self._rx = FusedReceiver(
            demod_config, decoder_config,
            channels=channels_per_device,   # per-device slab
            block_len=block_len, **rx_kwargs,
        )
        self.k = self._rx.k
        self.ring_len = self._rx.ring_len
        self._step = jax.jit(
            jax.shard_map(
                self._rx._step_impl,
                mesh=self.mesh,
                in_specs=(self.spec, self.spec),
                out_specs=(self.spec, self.spec, self.spec, self.spec),
                check_vma=False,
            )
        )

    def init_state(self):
        # Every leaf of the per-device RxState has a channels_per_device
        # leading dim; every device starts identical, so tile rows to this
        # process's slab and lift to the globally sharded array.
        local = self._rx.init_state()

        def lift(a):
            reps = self.channels_local // a.shape[0]
            tiled = np.tile(np.asarray(a), (reps,) + (1,) * (a.ndim - 1))
            return _to_global(self.sharding, tiled)

        return jax.tree.map(lift, local)

    def step(self, x_local, state):
        """`(C_local, T)` complex/CF32 IQ for THIS process -> (local numpy
        FrameBatch pytree with (C_local, k) fields, ok, overflow, state)."""
        if isinstance(x_local, CF32):
            re, im = np.asarray(x_local.re), np.asarray(x_local.im)
        else:
            x_local = np.asarray(x_local)
            re = x_local.real.astype(np.float32)
            im = x_local.imag.astype(np.float32)
        xg = CF32(
            _to_global(self.sharding, re), _to_global(self.sharding, im)
        )
        batch, ok, ovf, state = self._step(xg, state)
        return (
            jax.tree.map(_to_local, batch),
            _to_local(ok),
            _to_local(ovf),
            state,
        )
