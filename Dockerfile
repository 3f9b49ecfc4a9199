# Cold-start build/test parity with the reference's Dockerfile:12-19
# (which apt-installs a toolchain and proves both programs compile).
# Here the image additionally runs the quick test tier.
#
#   docker build -t xrit-tpu .
#   docker run xrit-tpu python -m pytest tests/ -q          # full suite
#   docker run xrit-tpu python -m xritdemod_tpu.cli --help
#
# On a TPU VM, base this on a jax[tpu] image instead; the CPU deps below
# are enough for the full CPU test suite (8 virtual devices).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir "jax[cpu]" flax optax chex einops numpy \
        scipy pytest pytest-xdist

WORKDIR /opt/xrit-tpu
COPY . .

RUN ./build.sh
