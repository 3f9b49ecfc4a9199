#!/usr/bin/env python3
"""One process of a multi-host distributed receive (tests/test_distributed.py
launches two; also the template for a real N-host launch).

Usage: dist_worker.py <process_id> <num_processes> <port> [devices_per_proc]

Joins a `jax.distributed` group over CPU devices (gloo collectives — the
DCN stand-in) and checks, exiting nonzero on any failure:
  1. channels: DistributedChannelReceiver demod over the (hosts, chips)
     mesh matches the local unsharded chain for this process's channels,
     and the sharded CADU decode round-trips bit-exactly.
  2. timeblocks: DistributedTimeBlockDemodulator recovers locked symbols
     that agree with the serial chain, with the ppermute halo crossing the
     process boundary.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 4

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={ndev} "
    + os.environ.get("XLA_FLAGS", "")
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from xritdemod_tpu.models.decoder import DecoderConfig  # noqa: E402
from xritdemod_tpu.models.demodulator import (  # noqa: E402
    DemodConfig,
    Demodulator,
)
from xritdemod_tpu.parallel import distributed as dist  # noqa: E402
from xritdemod_tpu.utils.cplx import from_complex  # noqa: E402


def log(*a):
    print(f"[p{pid}]", *a, flush=True)


def make_channel_signal(chan: int, T: int, cfg) -> np.ndarray:
    """Deterministic per-global-channel LRIT signal (any process can
    synthesize any channel's stream)."""
    from tests.test_demod_chain import make_lrit_signal

    rng = np.random.default_rng(1000 + chan)
    sig, _ = make_lrit_signal(rng, int(T / cfg.sps) + 200, cfg)
    return sig[:T]


def check_channels(mesh):
    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    T = 1 << 13
    rx = dist.DistributedChannelReceiver(
        cfg,
        DecoderConfig(mode="lrit", frames_per_block=1),
        channels_per_device=2,
        block_len=T,
        mesh=mesh,
    )
    CL = rx.channels_local
    first = pid * CL
    sig = np.stack(
        [make_channel_signal(first + i, T, cfg) for i in range(CL)]
    )

    state = rx.init_demod_state()
    soft, valid, state = rx.demod_block(sig, state)
    assert soft.shape == (CL, rx.num_slots), soft.shape

    # Local unsharded reference over the same channels.
    ref = Demodulator(cfg, block_len=T)
    rs, rv, _ = jax.jit(ref.block_batch)(
        from_complex(sig), ref.init_state_batch(CL)
    )
    assert np.array_equal(valid, np.asarray(rv)), "valid mismatch"
    np.testing.assert_allclose(soft, np.asarray(rs), atol=1e-5)
    log(f"channels: {CL} local ch match unsharded (of {rx.channels} global)")

    # Sharded decode: one frame per channel, bit-exact round trip.
    from xritdemod_tpu import tx

    rng = np.random.default_rng(7)
    vcdus_all = tx.make_vcdus(rx.channels, rng=rng)  # same on every process
    frames = np.stack(
        [
            tx.encode_stream(
                vcdus_all[c : c + 1],
                amp=0.8,
                noise=0.1,
                rng=np.random.default_rng(2000 + c),
            )
            for c in range(first, first + CL)
        ]
    )
    batch, _ = rx.decode_block(frames, rx.init_tails())
    ok = np.asarray(batch.frame_ok).reshape(-1)
    assert ok.all(), f"decode dropped frames: {ok}"
    assert np.array_equal(
        np.asarray(batch.vcdu).reshape(CL, -1), vcdus_all[first : first + CL]
    ), "sharded decode not bit-exact"
    log(f"decode: {CL} local frames bit-exact")


def check_timeblocks(mesh):
    """Time-block sharding with the LOSSLESS decode_overlap seam across
    the process (DCN-analog) boundary: each device re-emits its ppermute-
    carried copy of the left neighbour's tail, so every seam-spanning
    frame — including the ones straddling the host0/host1 sample boundary
    — must come back bit-exact from the right neighbour.  Each process
    asserts full coverage of the frames its kept streams span; the union
    over processes is every TX frame except process 0's cold-start head
    (the same zero-seam-loss policy the single-process dryrun proves,
    __graft_entry__.py dryrun_multichip, here with the duplicate stream
    actually crossing processes)."""
    from xritdemod_tpu import tx
    from xritdemod_tpu.models.decoder import DecoderConfig, StreamDecoder

    # Low-rate LRIT point (sps ~2.04) keeps the CPU run cheap while every
    # block still spans ~3.9 coded frames (same as the dryrun).
    cfg = DemodConfig.lrit(sample_rate=600_000)
    block, warm = 1 << 17, 8192
    frame_span = int(16384 * cfg.sps) + 1
    dec_ov = 2 * frame_span
    tb = dist.DistributedTimeBlockDemodulator(
        cfg, block_len=block, warmup=warm, decode_overlap=dec_ov, mesh=mesh
    )
    D = tb.n_devices
    total = D * block
    nframes = int(total / cfg.sps) // (16 * 1024) - 1
    rng = np.random.default_rng(42)  # same capture on every process
    vcdus = tx.make_vcdus(nframes, scid=13, vcid=9, counter0=300, rng=rng)
    symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
    sig = tx.modulate(
        symbols, cfg, rng=rng, freq_offset=5e-5, phase=0.3, amp=0.4,
        noise=0.01,
    )
    sig = np.concatenate(
        [sig, np.zeros(max(0, total - len(sig)), np.complex64)]
    )[:total]

    lo = pid * tb.n_local * block
    hi = lo + tb.n_local * block
    soft, valid = tb.process_local(sig[lo:hi])
    assert soft.shape[0] == tb.n_local

    sent = {(9, 300 + i): bytes(vcdus[i]) for i in range(nframes)}
    got: dict[tuple[int, int], bytes] = {}
    for i in range(tb.n_local):
        dec = StreamDecoder(DecoderConfig(mode="lrit", frames_per_block=4))
        batches = dec.push(soft[i][valid[i]])
        batches += dec.flush()
        for b in batches:
            ok = np.asarray(b.frame_ok)
            vcid = np.asarray(b.vcid)
            ctr = np.asarray(b.counter)
            vc = np.asarray(b.vcdu)
            for j in range(len(ok)):
                if ok[j]:
                    got.setdefault(
                        (int(vcid[j]), int(ctr[j])), bytes(vc[j])
                    )
    # No payload corruption anywhere.
    assert all(
        sent.get(k) == v for k, v in got.items() if k in sent
    ), "payload corruption across the process seam"
    # Coverage owed to THIS process: every frame whose samples lie fully
    # inside its kept streams [lo - dec_ov, hi], with one frame span of
    # sync-acquisition slack at the left edge and process 0's cold-start
    # pull-in excused (no left halo exists for the stream head).
    owe_lo = lo - dec_ov + frame_span if pid > 0 else 12000
    owed = {
        (9, 300 + i)
        for i in range(nframes)
        if i * 16384 * cfg.sps >= owe_lo
        and (i + 1) * 16384 * cfg.sps + 1000 <= hi
    }
    missing = owed - set(got)
    assert not missing, f"seam frames lost: {sorted(missing)[:5]}"
    crossing = sum(
        1
        for (v, c) in owed
        if (c - 300) * 16384 * cfg.sps < lo
    )
    log(
        f"timeblocks: {len(owed)} owed frames bit-exact incl. "
        f"{crossing} spanning the host boundary (dec_ov={dec_ov})"
    )


def check_fused(mesh):
    """The flagship fused receive (IQ -> ring -> FEC on-device), channel-
    sharded across BOTH processes; every recovered frame must be bit-exact
    against the TX fixture."""
    from xritdemod_tpu.models.decoder import DecoderConfig

    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    T = 1 << 15
    rx = dist.DistributedFusedReceiver(
        cfg, DecoderConfig(mode="lrit"), channels_per_device=2,
        block_len=T, mesh=mesh,
    )
    from xritdemod_tpu import tx

    vcdus = tx.make_vcdus(3, scid=13, vcid=9,
                          rng=np.random.default_rng(5))
    symbols = tx.encode_stream(
        vcdus, lrit=True, amp=1.0, rng=np.random.default_rng(6)
    )
    sig = tx.modulate(symbols, cfg, np.random.default_rng(7))
    want = {(i, bytes(vcdus[i])) for i in range(len(vcdus))}

    st = rx.init_state()
    got = [set() for _ in range(rx.channels_local)]
    for b in range(len(sig) // T):
        x = np.tile(sig[b * T : (b + 1) * T], (rx.channels_local, 1))
        batch, ok, ovf, st = rx.step(x, st)
        fok = np.asarray(batch.frame_ok) & np.asarray(ok)
        ctr = np.asarray(batch.counter)
        vc = np.asarray(batch.vcdu)
        for c, j in zip(*np.nonzero(fok)):
            got[c].add((int(ctr[c, j]), bytes(vc[c, j])))
    for c in range(rx.channels_local):
        assert got[c] <= want and len(got[c]) >= len(want) - 1, (
            f"fused ch {c}: {len(got[c])}/{len(want)}"
        )
    log(f"fused: {rx.channels_local} local ch recovered frames bit-exact "
        f"(of {rx.channels} global)")


def main():
    ok = dist.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert ok, "distributed group not active"
    assert jax.process_count() == nproc
    assert jax.device_count() == ndev * nproc, jax.device_count()
    log(
        f"joined: {jax.process_count()} processes x "
        f"{jax.local_device_count()} devices"
    )
    mesh = dist.make_host_mesh()
    assert mesh.shape == {"host": nproc, "chip": ndev}, mesh.shape
    check_channels(mesh)
    check_timeblocks(mesh)
    check_fused(mesh)
    log("ALL OK")


if __name__ == "__main__":
    main()
