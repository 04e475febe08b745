#!/bin/bash
# After the SH 7k run finishes, bench the reference QUALITY-config scale:
# ~2.4M gaussians render FPS (reference: 24.7-25.4 FPS, README.md:14,38-48).
# Runs RGB and SH render phases, each in its own process.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
L=/tmp/bench_qscale.log
: > $L

# wait for the SH run marker (up to 16h: A/B matrix + 6h run + tunnel gaps)
for i in $(seq 1 1920); do
  grep -q "SH RUN rc=" /tmp/run7k_sh.log 2>/dev/null && break
  sleep 30
done
sleep 30

run() { echo "=== $* ===" >> $L; timeout 3000 python bench.py "$@" >> $L 2>&1; echo "rc=$?" >> $L; }
run --phase render --n_gauss 2400000
run --phase render --n_gauss 2400000 --use_sh_coeff 1
echo "QSCALE DONE" >> $L
