#!/bin/bash
# SH at-scale benches via the legacy binning route (key-only sort + gathers):
# the fused path's 34-operand payload sort is the compile-time blocker for
# SH (both train and render-only SH graphs time out at 45 min; RGB with 10
# operands compiles in ~10).  Then XLA-op traces of the RGB render frame and
# train step at the tuned regime.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
L=/tmp/sh_bench_r3.log
: > $L
run() { echo "=== $* ===" >> $L; timeout "$1" python "${@:2}" >> $L 2>&1; echo "rc=$?" >> $L; }
run 5400 bench.py --phase train  --use_sh_coeff 1 --fused_pack 0
run 5400 bench.py --phase render --use_sh_coeff 1 --fused_pack 0
run 3600 scripts/profile_trace.py render
run 3600 scripts/profile_trace.py train
echo "ALL DONE" >> $L
