"""Multi-host distributed receive: 2 real `jax.distributed` CPU processes.

SURVEY.md §2d rows 5-6: the distributed backend replaces the reference's
TCP hop (SymbolManager.cpp:57 / newdecoder.cpp:188) with a jax.distributed
process group + collectives.  Only one host exists here, so the N>=2-host
path is proven the honest way a pod-less CI can: two OS processes, each
with 4 virtual CPU devices, joined through a real coordinator with gloo
collectives standing in for DCN.  The worker (tools/dist_worker.py) checks
channel-sharded demod + decode and the cross-process ppermute halo of the
time-block path, and exits nonzero on any mismatch.
"""

import os
import socket
import subprocess
import sys

import pytest

# Compile-heavy on XLA:CPU -- excluded from the quick tier (build.sh).
pytestmark = pytest.mark.heavy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_receive():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)         # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=REPO,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "ALL OK" in out, f"worker {i} incomplete:\n{out}"


def test_make_host_mesh_single_process():
    """Single-process degenerate case: (1, n_local) mesh over the virtual
    devices, same device order as jax.devices()."""
    import jax

    from xritdemod_tpu.parallel.distributed import make_host_mesh

    mesh = make_host_mesh()
    assert mesh.shape["host"] == 1
    assert mesh.shape["chip"] == len(jax.devices())


def test_distributed_channel_receiver_single_process(rng):
    """DistributedChannelReceiver on a 1-process (1, 8) mesh matches the
    unsharded chain (the same check the 2-process worker runs per host)."""
    import jax
    import numpy as np

    from xritdemod_tpu.models.demodulator import DemodConfig, Demodulator
    from xritdemod_tpu.parallel.distributed import (
        DistributedChannelReceiver,
        make_host_mesh,
    )
    from xritdemod_tpu.utils.cplx import from_complex

    sys.path.insert(0, os.path.dirname(__file__))
    from test_demod_chain import make_lrit_signal

    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    T = 1 << 13
    rx = DistributedChannelReceiver(
        cfg, channels_per_device=1, block_len=T, mesh=make_host_mesh()
    )
    sigs = []
    for c in range(rx.channels):
        sig, _ = make_lrit_signal(rng, int(T / cfg.sps) + 200, cfg)
        sigs.append(sig[:T])
    sig = np.stack(sigs)

    state = rx.init_demod_state()
    soft, valid, state = rx.demod_block(sig, state)

    ref = Demodulator(cfg, block_len=T)
    rs, rv, _ = jax.jit(ref.block_batch)(
        from_complex(sig), ref.init_state_batch(rx.channels)
    )
    assert np.array_equal(valid, np.asarray(rv))
    np.testing.assert_allclose(soft, np.asarray(rs), atol=1e-5)


def test_distributed_fused_receiver_single_process(rng):
    """DistributedFusedReceiver on a 1-process (1, 8) mesh recovers the
    same frames as the unsharded FusedReceiver (per-device rings/locks,
    zero collectives)."""
    import jax
    import numpy as np

    from xritdemod_tpu import tx
    from xritdemod_tpu.models.decoder import DecoderConfig
    from xritdemod_tpu.models.demodulator import DemodConfig
    from xritdemod_tpu.models.receiver import FusedReceiver
    from xritdemod_tpu.parallel.distributed import (
        DistributedFusedReceiver,
        make_host_mesh,
    )

    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    dcfg = DecoderConfig(mode="lrit")
    T = 1 << 15
    vcdus = tx.make_vcdus(4, scid=13, vcid=3, rng=rng)
    symbols = tx.encode_stream(vcdus, lrit=True, amp=1.0, rng=rng)
    sig = tx.modulate(symbols, cfg, rng)
    nblocks = len(sig) // T

    mesh = make_host_mesh()
    drx = DistributedFusedReceiver(
        cfg, dcfg, channels_per_device=8, block_len=T, mesh=mesh
    )
    rx = FusedReceiver(cfg, dcfg, channels=drx.channels, block_len=T)

    def collect(batch, ok, fok, k):
        out = []
        vcid = np.asarray(batch.vcid)
        ctr = np.asarray(batch.counter)
        vc = np.asarray(batch.vcdu)
        for c in range(vcid.shape[0]):
            for j in range(k):
                if ok[c, j] and fok[c, j]:
                    out.append((c, int(vcid[c, j]), int(ctr[c, j]),
                                bytes(vc[c, j])))
        return out

    dst, ust = drx.init_state(), rx.init_state()
    got_d, got_u = [], []
    for b in range(nblocks):
        x = np.tile(sig[b * T : (b + 1) * T], (drx.channels, 1))
        db, dok, dovf, dst = drx.step(x, dst)
        ub, uok, uovf, ust = rx.step(x, ust)
        got_d.extend(collect(db, np.asarray(dok), np.asarray(db.frame_ok),
                             drx.k))
        got_u.extend(collect(ub, np.asarray(uok), np.asarray(ub.frame_ok),
                             rx.k))
    assert len(got_u) >= drx.channels * 2   # sanity: frames recovered
    assert got_d == got_u
