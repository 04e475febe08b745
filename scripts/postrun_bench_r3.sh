#!/bin/bash
# Post-7k TPU measurement pipeline: waits for the 7k run to release the
# (single-tenant) chip, then runs the round-3 A/B matrix and the SH bench,
# each phase in its own process so the persistent compile cache accumulates
# and each graph compiles alone.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
EXP=runs/7k_garden_r3
L=/tmp/bench_ab_r3.log
: > $L

# wait for the run: summary written, or its supervisor gone
for i in $(seq 1 720); do
  [ -f "$EXP/summary.json" ] && break
  pgof=$(ps -p "$(cat /tmp/run7k_sup.pid 2>/dev/null || echo 0)" -o pid= 2>/dev/null | wc -l)
  [ "$pgof" -eq 0 ] && break
  sleep 10
done
sleep 60   # let the worker settle

run() { echo "=== $* ===" >> $L; timeout 2700 python bench.py "$@" >> $L 2>&1; echo "rc=$?" >> $L; }
run                                                    # new baseline (slot shrink)
run --px_split 2                                       # + sub-tile early stop
run --phase render --render_preset 1                   # bf16 preset
run --phase render --render_preset 1 --px_split 2      # bf16 + sub-tile
run --phase train --use_sh_coeff 1                     # SH at scale (train it/s)
run --phase render --use_sh_coeff 1                    # SH render FPS
echo "ALL DONE" >> $L
