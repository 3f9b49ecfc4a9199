#!/usr/bin/env python3
"""Throughput scaling sweeps: channels per chip and devices in a mesh.

  channels mode (TPU): demod-chain Msamples/s vs channel count on one chip.
  mesh mode (CPU logic / multi-chip when available): samples/s scaling
  efficiency of the channel-sharded receiver across an N-device mesh
  (BASELINE.json config 5 logic; run with
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for
  the virtual-device version — remember JAX_PLATFORMS must be forced in
  code on this machine, which this script does when the env var is set).

Usage:
  python tools/scaling_sweep.py channels --list 32,64,128,256
  python tools/scaling_sweep.py mesh --devices 1,2,4,8
"""

from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import os
import sys
import time


def _maybe_force_cpu():
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def sync(arr):
    import numpy as np

    return float(np.asarray(arr.reshape(-1)[0]))


def sweep_channels(counts, block=1 << 17, iters=3):
    import numpy as np
    import jax.numpy as jnp

    from xritdemod_tpu.models.demodulator import DemodConfig
    from xritdemod_tpu.parallel.channels import ChannelDemodulator
    from xritdemod_tpu.utils.cplx import CF32

    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    rng = np.random.default_rng(0)
    out = []
    for C in counts:
        demod = ChannelDemodulator(cfg, channels=C, block_len=block)
        x = CF32(
            jnp.asarray(rng.normal(0, 0.3, (C, block)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.3, (C, block)).astype(np.float32)),
        )
        state = demod.init_state()
        soft, valid, state = demod.process(x, state)
        sync(soft)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            soft, valid, state = demod.process(x, state)
            sync(soft)
            times.append(time.perf_counter() - t0)
        best = min(times)
        msps = C * block / best / 1e6
        out.append({"channels": C, "block": block, "s_per_block": best,
                    "msamples_per_s": round(msps, 2)})
        print(f"C={C:4d}: {best*1000:8.1f} ms/block  {msps:9.2f} Msamp/s",
              file=sys.stderr)
    return out


def sweep_mesh(device_counts, channels_per_device=8, block=1 << 15, iters=3):
    """Weak-scaling sweep over an n-device channel mesh.

    Reports two efficiencies per point:
      - scaling_efficiency: rate(n) / (n * rate(1)/1) — the naive weak-
        scaling number.  On VIRTUAL CPU devices all n "devices" share the
        host's physical cores, so this is core-count-bound, NOT a property
        of the sharding design (n=8 on a 4-core host cannot exceed ~0.5).
      - sharding_efficiency: t_unsharded / t_sharded for the SAME total
        work on the same resources — one plain batched step over all
        channels on one device vs the shard_map'd step over n devices.
        This isolates the cost the sharding machinery itself adds (the
        number that transfers to real multi-chip hardware, where each
        device brings its own cores and the channel axis needs zero
        collectives).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from xritdemod_tpu.models.demodulator import DemodConfig
    from xritdemod_tpu.parallel.channels import ChannelDemodulator, make_channel_mesh
    from xritdemod_tpu.utils.cplx import CF32

    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    rng = np.random.default_rng(0)
    out = []
    base_rate = None

    def timed(demod, x, state):
        soft, valid, state = demod.process(x, state)
        sync(soft)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            soft, valid, state = demod.process(x, state)
            sync(soft)
            times.append(time.perf_counter() - t0)
        return min(times)

    for n in device_counts:
        devs = jax.devices()[:n]
        if len(devs) < n:
            print(f"skipping n={n}: only {len(devs)} devices", file=sys.stderr)
            continue
        C = n * channels_per_device
        x = CF32(
            jnp.asarray(rng.normal(0, 0.3, (C, block)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.3, (C, block)).astype(np.float32)),
        )
        mesh = make_channel_mesh(devs)
        demod = ChannelDemodulator(cfg, channels=C, block_len=block, mesh=mesh)
        best = timed(demod, x, demod.init_state())
        plain = ChannelDemodulator(cfg, channels=C, block_len=block, mesh=None)
        best_plain = timed(plain, x, plain.init_state())

        rate = C * block / best
        if base_rate is None:
            base_rate = rate / n
        eff = rate / (n * base_rate)
        shard_eff = best_plain / best
        out.append({
            "devices": n, "channels": C, "samples_per_s": rate,
            "scaling_efficiency": round(eff, 3),
            "sharding_efficiency": round(shard_eff, 3),
            "s_sharded": best, "s_unsharded_1dev": best_plain,
        })
        print(f"n={n}: {rate/1e6:9.2f} Msamp/s  weak-scaling {eff:.2f}  "
              f"sharding {shard_eff:.2f}", file=sys.stderr)
    return out


def main() -> int:
    _maybe_force_cpu()
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("channels")
    c.add_argument("--list", default="32,64,128,256")
    c.add_argument("--block", type=int, default=1 << 17)
    m = sub.add_parser("mesh")
    m.add_argument("--devices", default="1,2,4,8")
    m.add_argument("--block", type=int, default=1 << 15)
    args = p.parse_args()
    if args.cmd == "channels":
        res = sweep_channels([int(v) for v in args.list.split(",")], args.block)
    else:
        res = sweep_mesh([int(v) for v in args.devices.split(",")], block=args.block)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
