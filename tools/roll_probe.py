"""Probe: pltpu.roll + select throughput by dtype (f32/i32/u32).

Finding (recorded): barrel rolls are dtype-AGNOSTIC on the VPU — f32,
i32 and u32 all measure the same per stage.  That killed the "packed
bf16-pair ring" idea (store 2 bf16 symbols per uint32 lane to halve the
barrel lane count): halving lanes does not halve roll time, while the
pack/unpack and wrap-boundary 16-bit fix-ups add real work.  Measured on
the fused-rx bench at C=1024: bf16 ring 2152 Msamp/s vs packed variants
2017 (XLA-side pair interleave), 2024 (split-half layout), 2069
(in-kernel pack) — all slower; the bf16 ring (HBM bf16, f32 in-kernel
rolls) stays the TPU default.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, L = 1024, 36864
N = 8


def _kernel(x_ref, amt_ref, o_ref, *, L, stages):
    x = x_ref[:, :]
    amt = amt_ref[:, :]
    for b in range(stages):
        sh = (1 << b) % L
        r = pltpu.roll(x, sh, axis=1)
        bit = ((amt >> b) & 1) > 0
        x = jnp.where(bit, r, x)
    o_ref[:, :] = x


@functools.partial(jax.jit, static_argnames=("stages",))
def barrel(x, amt, stages):
    C, L = x.shape
    R = 8
    row = lambda i: (i, 0)
    return pl.pallas_call(
        functools.partial(_kernel, L=L, stages=stages),
        grid=(C // R,),
        in_specs=[
            pl.BlockSpec((R, L), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, L), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, L), x.dtype),
    )(x, amt)


def main():
    rng = np.random.default_rng(0)
    amt = jnp.asarray(rng.integers(0, L, (C, 1)), jnp.int32)
    stages = max(1, (L - 1).bit_length())
    sync = lambda a: float(np.asarray(a).ravel()[0].astype(np.float64))
    for name, x in (
        ("f32", jnp.asarray(rng.normal(size=(C, L)).astype(np.float32))),
        ("i32", jnp.asarray(rng.integers(0, 1 << 30, (C, L)), jnp.int32)),
        ("u32", jnp.asarray(rng.integers(0, 1 << 30, (C, L)), jnp.uint32)),
    ):
        out = barrel(x, amt, stages)
        sync(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(N):
            out = barrel(out, amt, stages)
        sync(out[0, 0])
        dt = (time.perf_counter() - t0) / N
        print(f"{name}: {dt * 1e3:7.2f} ms ({stages} stages, ({C},{L}))",
              flush=True)


if __name__ == "__main__":
    main()
