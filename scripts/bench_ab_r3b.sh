#!/bin/bash
# Round-3b A/B matrix: composed-permutation pack + gather_colors/gather_geom.
# Waits for the TPU tunnel to come back, then runs each phase in its own
# process (persistent compile cache accumulates; each graph compiles alone).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
L=/tmp/bench_ab_r3b.log
: > $L

# wait for the TPU backend (tunnel can be down for a while)
for i in $(seq 1 120); do
  timeout 420 python -c "import jax; jax.devices()" >> $L 2>&1 && break
  echo "--- tpu not up (attempt $i)" >> $L
  sleep 60
done

run() { echo "=== $* ===" >> $L; timeout 2700 python bench.py "$@" >> $L 2>&1; echo "rc=$?" >> $L; }
run                                                    # composed-permutation baseline (train+render)
run --gather_geom 1                                    # full gather route, RGB
run --phase render --render_preset 1                   # bf16 preset (sanity)
run --phase train --use_sh_coeff 1                     # SH fused+gather_colors (new default)
run --phase render --use_sh_coeff 1                    # SH render FPS
run --phase train --use_sh_coeff 1 --gather_geom 1     # SH full gather
run --phase render --use_sh_coeff 1 --gather_geom 1
echo "ALL DONE" >> $L
