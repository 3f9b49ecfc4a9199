"""Pipelined per-stage timing of the CADU decode chain on TPU.

Unlike tools/decode_bench.py (per-dispatch sync: useless through the ~25 ms
tunnel floor), every stage here is timed pipelined: N calls chained through
a carried dependency, one sync, /N.

Usage: python tools/decode_profile.py [B] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from xritdemod_tpu import constants as C
from xritdemod_tpu.models.decoder import CaduDecoder, DecoderConfig
from xritdemod_tpu.ops import reed_solomon as rs_op
from xritdemod_tpu.ops.viterbi_pallas import (
    viterbi_decode_pallas,
    viterbi_decode_segmented,
)
from xritdemod_tpu.utils.bits import pack_bits

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N = int(sys.argv[2]) if len(sys.argv) > 2 else 6

dec = CaduDecoder(DecoderConfig(mode="lrit", frames_per_block=B))
print(f"backend={jax.default_backend()} B={B} iters={N}", flush=True)

rng = np.random.default_rng(0)
frames = jnp.asarray(rng.normal(0, 32, (B, 16384)).astype(np.float32))
tails = jnp.zeros((B, 64), jnp.float32)

sync = lambda a: float(np.asarray(a).ravel()[0])


def timed(name, fn, carry):
    """Pipelined: each iteration's output is the next's input, so the N
    dispatches are genuinely serialized through a data dependency; one
    device->host sync at each end."""
    out = fn(carry)
    leaf = [l for l in jax.tree.leaves(out) if hasattr(l, "ndim")][0]
    sync(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(out)
    leaf = [l for l in jax.tree.leaves(out) if hasattr(l, "ndim")][0]
    sync(leaf[(0,) * leaf.ndim])
    dt = (time.perf_counter() - t0) / N
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return out


# Full decode_frames chained through tails
def full(tails):
    batch, nt = dec._decode_frames(frames, tails)
    return nt


timed("full decode_frames", full, tails)

# Viterbi segmented, chained through the input (add tiny feedback)
ext = jnp.concatenate([tails, frames], axis=1)
for S in (2, 4, 8):
    if B * S > 8192 or (B * S) % 8:
        continue

    @jax.jit
    def vit_chain(x, S=S):
        bits, errs = viterbi_decode_segmented(x, segments=S, overlap=128)
        return x + (errs[:, None] % 2).astype(jnp.float32) * 0, bits

    def vstep(carry, vc=vit_chain):
        x, _ = vc(carry[0])
        return (x, _)

    timed(f"viterbi segmented S={S}", vstep, (ext, None))

for ov in (64, 96):
    @jax.jit
    def vit_ov(x, ov=ov):
        bits, errs = viterbi_decode_segmented(x, segments=4, overlap=ov)
        return x + (errs[:, None] % 2).astype(jnp.float32) * 0, bits

    def ostep(carry, vo=vit_ov):
        return vo(carry[0])

    if B * 4 <= 8192:
        timed(f"viterbi segmented S=4 overlap={ov}", ostep, (ext, None))

if B <= 2048:
    @jax.jit
    def vit_plain(x):
        bits, errs = viterbi_decode_pallas(x)
        return x + (errs[:, None] % 2).astype(jnp.float32) * 0, bits

    def pstep(carry):
        return vit_plain(carry[0])

    timed("viterbi plain (S=1)", pstep, (ext, None))

# pack_bits alone
bits = jnp.asarray(rng.integers(0, 2, (B, 8224), dtype=np.int32).astype(np.uint8))


@jax.jit
def packer(b):
    by = pack_bits(b)
    return b ^ (by[:, :1] * 0).astype(jnp.uint8), by


def pk(carry):
    return packer(carry[0])


timed("pack_bits", pk, (bits, None))

# RS decode chained
fb = jnp.asarray(rng.integers(0, 256, (B, 1020), dtype=np.int32))


@jax.jit
def rs_chain(x):
    corr, nerr = rs_op.rs_decode_frame(x)
    return corr.astype(jnp.int32), nerr


def rstep(carry):
    return rs_chain(carry[0])


timed("rs_decode_frame (errored path)", rstep, (fb, None))

# RS clean path: valid codewords -> zero syndromes -> the lax.cond skips
# BM/Chien/Forney (the steady-state case; post-Viterbi output is usually
# error-free).
clean_cw = rs_op.rs_encode_np(
    rng.integers(0, 256, (4, 223), dtype=np.int64).astype(np.uint8)
)
clean = jnp.asarray(
    np.tile(
        rs_op.interleave(clean_cw.reshape(1, 4, 255)).astype(np.int32),
        (B, 1),
    )
)


def rcstep(carry):
    return rs_chain(carry[0])


timed("rs_decode_frame (clean fast path)", rcstep, (clean, None))

# sync_and_fix alone
@jax.jit
def snf(x):
    fixed, word, corr, ok = dec._sync_and_fix(x)
    return fixed, word


def sstep(carry):
    return snf(carry[0])


timed("sync_and_fix", sstep, (frames, None))

# derandomize
from xritdemod_tpu.ops.derandomizer import derandomize

by = jnp.asarray(rng.integers(0, 256, (B, 1020), dtype=np.int32).astype(np.uint8))


@jax.jit
def dr(x):
    return (derandomize(x),)


def dstep(carry):
    return dr(carry[0])


timed("derandomize", dstep, (by,))
