"""xritdemod_tpu — TPU-native GOES xRIT receive framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
opensatelliteproject/xritdemod: BPSK demodulation (decimating FIR, AGC, RRC
matched filter, Costas carrier recovery, M&M clock recovery) and CADU
decoding (frame sync, Viterbi r=1/2, NRZ-M, CCSDS derandomizer,
Reed-Solomon 255/223), as block-functional kernels over device meshes.
"""

__version__ = "0.5.0"


def version_info() -> str:
    """Library/version introspection (SatHelper `Info` equivalent,
    /root/reference/demodulator/src/demodulator.cpp:233-234)."""
    import subprocess

    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
            cwd=__path__[0],
        ).stdout.strip() or "unknown"
    except Exception:
        sha = "unknown"
    import jax

    return f"xritdemod_tpu {__version__} ({sha}) on jax {jax.__version__}"
