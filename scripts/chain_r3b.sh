#!/bin/bash
# Round-3b TPU pipeline: wait for the A/B matrix, then run the at-scale SH
# quality run (the reference quality config's analogue, README.md:44-48).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo

# wait for the A/B matrix (up to 8h: tunnel may be down a while)
for i in $(seq 1 960); do
  grep -q "ALL DONE" /tmp/bench_ab_r3b.log 2>/dev/null && break
  sleep 30
done

sleep 30
timeout 21600 python scripts/run_garden_7k.py --use_sh_coeff 1 \
  --exp runs/7k_garden_sh > /tmp/run7k_sh.log 2>&1
echo "SH RUN rc=$?" >> /tmp/run7k_sh.log
