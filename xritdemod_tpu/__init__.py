"""xritdemod_tpu — TPU-native GOES xRIT receive framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
opensatelliteproject/xritdemod: BPSK demodulation (decimating FIR, AGC, RRC
matched filter, Costas carrier recovery, M&M clock recovery) and CADU
decoding (frame sync, Viterbi r=1/2, NRZ-M, CCSDS derandomizer,
Reed-Solomon 255/223), as block-functional kernels over device meshes.
"""

__version__ = "0.1.0"
