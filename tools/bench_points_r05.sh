#!/bin/bash
# Sequential bench-point refresh for round 5 (ONE TPU process at a time).
# Output: one labeled JSON line per point on stdout.
# New vs r04: the RS sparse-error point (1% errored frames through the
# errored-subset compaction, ops/reed_solomon.py), and every clock point
# now runs the GR-lag-fixed kernels with the ct=512/superchunks=24 VMEM
# geometry (models/demodulator.py).
cd /root/repo
set -u
run() {
  label="$1"; shift
  line=$(timeout 580 env "$@" python bench.py 2>/dev/null | tail -1)
  echo "POINT ${label} ${line}"
}
# bench.py's operating point = the shipped default (clock_interp=mmse
# since round 5); the _sinc points pin the alternate tap path.
run demod_lrit BENCH_KIND=demod
run demod_lrit_sinc BENCH_KIND=demod BENCH_CLOCK_INTERP=sinc
run demod_lrit_signal BENCH_KIND=demod BENCH_SIGNAL=1
run demod_lrit_dec2 BENCH_KIND=demod BENCH_DECIMATION=2
run demod_hrit BENCH_KIND=demod BENCH_MODE=hrit
run decode_lrit_b4096 BENCH_KIND=decode BENCH_FRAMES=4096
run decode_lrit_b4096_rs_errored BENCH_KIND=decode BENCH_FRAMES=4096 BENCH_RS_ERRORED=1
run decode_lrit_b4096_rs_sparse BENCH_KIND=decode BENCH_FRAMES=4096 BENCH_RS_SPARSE=1
run decode_lrit_b4096_rs_sparse_off BENCH_KIND=decode BENCH_FRAMES=4096 BENCH_RS_SPARSE=1 XRIT_RS_SPARSE=0
run decode_lrit_b256 BENCH_KIND=decode BENCH_FRAMES=256
run decode_hrit_b4096 BENCH_KIND=decode BENCH_MODE=hrit BENCH_FRAMES=4096
run rx_lrit BENCH_KIND=rx
run rx_lrit_sinc BENCH_KIND=rx BENCH_CLOCK_INTERP=sinc
run rx_hrit BENCH_KIND=rx BENCH_MODE=hrit
echo DONE
