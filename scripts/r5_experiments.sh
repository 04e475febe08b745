#!/bin/bash
# Round-5 TPU experiment queue — run ONLY when no other TPU process is
# live (single-tenant tunnel).  Ordered by information value per minute:
#   E0  tunnel-transfer microbench (explains the 280 s scene-load push)
#   E1  pack decomposition at the 2.4M quality scale (the unattributed
#       86 ms frame: sort-side vs kernel-side split decides round-6 work)
#   E2  px_split=2 A/B at 2.4M (regressed at 506k; occupancy at 2.4M is
#       ~9 chunks/tile so the sub-tile early-stop trade may flip)
#   E3  cull_sublsb=1 A/B at 2.4M (neutral at 506k occupancy; the 2.4M
#       table carries a different opacity mix)
# Every bench goes through `timeout -k 60` — bench.py now converts
# SIGTERM into its partial-JSON path.
set -u
cd "$(dirname "$0")/.."
LOG=runs/r5_experiments.log
mkdir -p runs
stamp() { echo "=== $(date +%H:%M:%S) $* ===" | tee -a "$LOG"; }

stamp "E0 tunnel transfer microbench"
timeout -k 30 240 python - >> "$LOG" 2>&1 <<'EOF'
import time
import numpy as np
import jax, jax.numpy as jnp
for mb in (1, 16, 64, 183):
    a = np.zeros((mb, 1024, 1024), np.uint8)
    t0 = time.time()
    d = jnp.asarray(a)
    d.block_until_ready()
    # tunnel result-cache guard: force a host fetch of fresh data
    float(jnp.sum(d[:, :2, :2].astype(jnp.float32)))
    dt = time.time() - t0
    print(f"push {mb:4d} MB: {dt:6.2f}s  {mb/max(dt,1e-9):7.1f} MB/s",
          flush=True)
EOF

stamp "E1 pack decomposition at 2.4M"
PYTHONPATH=/root/.axon_site:/root/repo timeout -k 30 1500 \
    python scripts/profile_pack.py --n_gauss 2400000 --k_small 4 \
    --k_big 12 >> "$LOG" 2>&1

stamp "E2 2.4M RGB render, px_split=2"
timeout -k 60 1200 python bench.py --phase render --n_gauss 2400000 \
    --px_split 2 > runs/bench_r5_2m4_px2.json.tmp 2>> "$LOG" \
    && tail -1 runs/bench_r5_2m4_px2.json.tmp > runs/bench_r5_2m4_px2.json \
    && rm -f runs/bench_r5_2m4_px2.json.tmp

stamp "E3 2.4M RGB render, cull_sublsb=1"
timeout -k 60 1200 python bench.py --phase render --n_gauss 2400000 \
    --cull_sublsb 1 > runs/bench_r5_2m4_cull.json.tmp 2>> "$LOG" \
    && tail -1 runs/bench_r5_2m4_cull.json.tmp > runs/bench_r5_2m4_cull.json \
    && rm -f runs/bench_r5_2m4_cull.json.tmp

stamp "experiments done"
