"""Pipelined per-component timing of the fused receiver on TPU.

Each component is timed the way bench.py times the chain: N iterations
queued back-to-back through carried state, ONE device->host sync, /N.
Locates where the fused-rx block time goes (demod vs ring vs acquisition
vs decode).

Usage: python tools/rx_profile.py [C] [T] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu.models.decoder import DecoderConfig
from xritdemod_tpu.models.demodulator import DemodConfig
from xritdemod_tpu.models.receiver import FusedReceiver
from xritdemod_tpu.ops import correlator as corr_op
from xritdemod_tpu.ops.ring_pallas import ring_append, ring_extract
from xritdemod_tpu.utils.cplx import CF32

C = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 17
N = int(sys.argv[3]) if len(sys.argv) > 3 else 6

MODE = os.environ.get("RX_PROFILE_MODE", "lrit")
cfg = (DemodConfig.hrit(sample_rate=3_000_000) if MODE == "hrit"
       else DemodConfig.lrit(sample_rate=1_250_000))
rx = FusedReceiver(cfg, DecoderConfig(mode=MODE), channels=C, block_len=T)
print(
    f"backend={jax.default_backend()} C={C} T={T} iters={N} "
    f"k={rx.k} ring_len={rx.ring_len} ring_dtype={rx.ring_dtype}",
    flush=True,
)

rng = np.random.default_rng(0)
x = CF32(
    jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
    jnp.asarray(rng.normal(0, 0.3, (C, T)).astype(np.float32)),
)
st = rx.init_state()

sync = lambda a: float(np.asarray(a).ravel()[0])


def _leaf(out):
    return [
        l for l in jax.tree.leaves(out)
        if hasattr(l, "ndim") and l.size > 0
    ][0]


def timed(name, fn, carry):
    """Pipelined: each iteration's output is the next's input (a real
    data dependency serializes the N dispatches); one sync at each end."""
    out = fn(carry)  # compile
    leaf = _leaf(out)
    sync(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(out)
    leaf = _leaf(out)
    sync(leaf[(0,) * leaf.ndim])
    dt = (time.perf_counter() - t0) / N
    print(f"{name:38s} {dt * 1e3:8.2f} ms/block", flush=True)
    return out


# Full fused step (noise input: lock path exercises acquisition every time,
# which is the worst case; a locked stream skips it).
def full(st):
    batch, ok, ovf, st2 = rx._step(x, st)
    return st2


st2 = timed("full rx step (unlocked: acq on)", full, st)


# Demod alone (chained through the demod state)
def dm_step(st_d):
    soft, valid, st_d2 = rx._demod.block_batch(x, st_d)
    return st_d2


timed("demod block_batch", dm_step, st.demod)

# Ring append alone (chained through ring state)
soft = jnp.zeros((C, rx._demod.num_slots), jnp.float32)
n_new = jnp.full((C,), min(30000, rx._demod.num_slots), jnp.int32)


@jax.jit
def append_only(ring, fill):
    r2, f2, _ = ring_append(ring, fill, soft, n_new)
    # keep fill bounded so the chain doesn't saturate
    return r2, jnp.where(f2 > rx.ring_len - 2 * 16384, 0, f2)


def app(carry):
    return append_only(*carry)


timed("ring_append", app, (st.ring, st.fill))

# Ring extract alone
pos = jnp.zeros((C,), jnp.int32)


@jax.jit
def extract_only(ring, fill):
    r2, f2, out, ok = ring_extract(ring, fill, pos, 16384)
    return r2, jnp.where(ok, f2, fill + 30000), out


def ext(carry):
    r2, f2, out = extract_only(carry[0], carry[1])
    return r2, f2, out


full_fill = jnp.full((C,), rx.ring_len - 100, jnp.int32)
timed("ring_extract", ext, (st.ring, full_fill))

# Acquisition correlate over the ring window
acq = rx._acq
templates = rx._templates


@jax.jit
def do_acq(ring):
    counts = corr_op.correlate(ring[:, :acq].astype(jnp.float32), templates)
    corr, _, p = corr_op.best_correlation(counts)
    return corr, p


@jax.jit
def acq_step(carry):
    ring, _ = carry
    corr, p = do_acq(ring)
    # Fold a data-derived zero back into the ring so the chain carries a
    # real dependency (costs one ring-sized add, ~0.1 ms — negligible
    # against the correlation itself).
    return (ring + (corr[:, None] * 0).astype(ring.dtype), corr)


timed("acquisition correlate", acq_step, (st.ring, None))

# One decode_frames call (chained through tails)
frames = jnp.asarray(rng.normal(0, 32, (C, 16384)).astype(np.float32))


def dec(tails):
    batch, nt = rx._dec._decode_frames(frames, tails)
    return nt


timed("decode_frames (x1; step does k)", dec, st.tails)
print(f"# k={rx.k} extractions per step", flush=True)
