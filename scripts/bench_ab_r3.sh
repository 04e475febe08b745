#!/bin/bash
# Round-3 A/B matrix on the real TPU (run AFTER the 7k run releases the
# chip — the tunnel is single-tenant).  Each variant is its own process so
# the persistent compile cache accumulates and phases compile alone.
set -x
cd /root/repo
L=/tmp/bench_ab_r3.log
: > $L
run() { echo "=== $* ===" >> $L; timeout 2700 python bench.py "$@" >> $L 2>&1; }
run                                   # new-baseline (slot shrink)
run --px_split 2                      # + sub-tile early stop
run --phase render --render_preset 1  # bf16 preset (flat payload dropped)
run --phase render --render_preset 1 --px_split 2
tail -40 $L
