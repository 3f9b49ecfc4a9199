"""Full-receive verify drive on the real TPU: RF in -> bit-exact VCDUs.

Synthesizes real encoded LRIT frames (xritdemod_tpu.tx), RRC-shapes them
with carrier offset + noise, runs the channel-batched demod chain with the
DEFAULT TPU config (fused Pallas front-end, auto slab/precision) plus the
streaming decoder, and asserts every decoded VCDU is a bit-exact copy of a
transmitted one.  This is the on-device check that the TPU-only defaults
(K=8 slab AGC/Costas, bf16 RRC matmuls) preserve post-FEC bit-exactness.

Usage: python tools/drive_rx_tpu.py [nframes] [C]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_demod_chain import make_lrit_signal  # noqa: F401 (fixture dep)

    from xritdemod_tpu import tx
    from xritdemod_tpu.models.decoder import DecoderConfig, StreamDecoder
    from xritdemod_tpu.models.demodulator import DemodConfig
    from xritdemod_tpu.ops import filters
    from xritdemod_tpu.parallel.channels import ChannelDemodulator
    from xritdemod_tpu.utils.cplx import CF32

    assert jax.default_backend() == "tpu", jax.default_backend()
    nframes = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    rng = np.random.default_rng(3)
    cfg = DemodConfig.lrit(sample_rate=1_250_000)
    vcdus = tx.make_vcdus(nframes, scid=13, vcid=5, rng=rng)
    symbols = tx.encode_stream(vcdus, lrit=True)

    # RRC-shape at 4x oversampling, add carrier offset + AWGN (the same
    # impairment fixture as tests/test_demod_chain.py chain tests).
    sps = cfg.sps
    os_factor = 4
    ntaps = 127
    nsym = len(symbols)
    fine_len = int(nsym * sps * os_factor) + ntaps * os_factor
    impulses = np.zeros(fine_len)
    pos = (np.arange(nsym) * sps * os_factor).astype(np.int64)
    impulses[pos] = symbols
    fine_rate = cfg.circuit_sample_rate * os_factor
    rc = filters.rrc_taps(
        1.0, fine_rate, cfg.symbol_rate, cfg.rrc_alpha, ntaps * os_factor
    )
    shaped = np.convolve(impulses, rc.astype(np.float64) * os_factor,
                         mode="same")
    sig = shaped[::os_factor].astype(np.complex128)
    n = np.arange(len(sig))
    sig = sig * np.exp(1j * (2 * np.pi * 1e-4 * n + 0.4)) * 0.3
    sig += (rng.normal(size=len(sig)) + 1j * rng.normal(size=len(sig))) * 0.01
    sig = sig.astype(np.complex64)

    T = 1 << 16
    demod = ChannelDemodulator(cfg, channels=C, block_len=T)
    state = demod.init_state()
    dec = StreamDecoder(DecoderConfig(mode="lrit", frames_per_block=4))
    got = []
    for b in range(len(sig) // T):
        blk = sig[b * T : (b + 1) * T]
        x = CF32(
            jnp.asarray(np.tile(blk.real.astype(np.float32), (C, 1))),
            jnp.asarray(np.tile(blk.imag.astype(np.float32), (C, 1))),
        )
        soft, valid, state = demod.process(x, state)
        s0 = np.asarray(soft[0])[np.asarray(valid[0])]
        for batch in dec.push(s0):
            ok = np.asarray(batch.frame_ok)
            got.extend(np.asarray(batch.vcdu)[ok])
    for batch in dec.flush():
        ok = np.asarray(batch.frame_ok)
        got.extend(np.asarray(batch.vcdu)[ok])

    sent = {bytes(v) for v in vcdus}
    assert len(got) >= nframes - 2, (len(got), nframes)
    bad = sum(bytes(v) not in sent for v in got)
    assert bad == 0, f"{bad}/{len(got)} decoded VCDUs not bit-exact"
    print(f"RX TPU DRIVE OK: {len(got)}/{nframes} frames decoded bit-exact "
          f"(C={C}, defaults: fused front-end, K=8 slabs, bf16 RRC)")


if __name__ == "__main__":
    main()
