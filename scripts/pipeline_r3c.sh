#!/bin/bash
# Round-3c TPU pipeline: A/B matrix (gather route + sub-LSB cull), then the
# at-scale SH quality run (the reference quality config's analogue,
# README.md:44-48).  Each bench phase runs in its own process so every graph
# compiles alone and the persistent compile cache accumulates.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
L=/tmp/bench_ab_r3c.log
: > $L

# wait for the TPU backend (tunnel can be down for a while)
for i in $(seq 1 600); do
  timeout 420 python -c "import jax; jax.devices()" >> $L 2>&1 && break
  echo "--- tpu not up (attempt $i)" >> $L
  sleep 60
done

run() { echo "=== $* ===" >> $L; timeout 2700 python bench.py "$@" >> $L 2>&1; echo "rc=$?" >> $L; }
run                                                    # RGB baseline (train+render)
run --cull_sublsb 1                                    # RGB + sub-LSB cull
run --gather_geom 1                                    # RGB full gather route
run --gather_geom 1 --cull_sublsb 1                    # both
run --phase render --render_preset 1                   # bf16 preset (sanity)
run --phase train --use_sh_coeff 1                     # SH fused+gather_colors (new default)
run --phase render --use_sh_coeff 1                    # SH render FPS
run --phase train --use_sh_coeff 1 --gather_geom 1     # SH full gather
run --phase render --use_sh_coeff 1 --gather_geom 1
echo "ALL DONE" >> $L

# ---- fresh stage trace of the winning-route candidates --------------------
P=/tmp/profile_fused_r3c.log
: > $P
prof() { echo "=== $* ===" >> $P; timeout 2700 python scripts/profile_fused.py "$@" >> $P 2>&1; echo "rc=$?" >> $P; }
prof                                       # RGB default route
prof --gather_geom 1 --cull_sublsb 1       # full gather + cull
echo "PROF DONE" >> $P

# ---- at-scale SH quality run (crash-supervised inside the runner) --------
# route choice: the FASTEST SH train route whose A/B phase produced a JSON
# result (i.e. whose graph compiled); legacy binning is the known-compiling
# fallback at 2.77 it/s (PERF.md round-3)
sleep 30
SH_ROUTE=$(python - "$L" <<'PYEOF'
import json, sys
best, route = 2.77, "--fused_pack 0"     # legacy fallback baseline
cur = None
for line in open(sys.argv[1], errors="replace"):
    line = line.strip()
    if line.startswith("=== "):
        cur = "--gather_geom 1" if "--gather_geom 1" in line else ""
    if line.startswith("{"):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if (d.get("metric", "").endswith("_sh")
                and d.get("unit") == "it/s" and cur is not None
                and d["value"] > best):
            best, route = d["value"], cur
print(route)
PYEOF
)
echo "SH ROUTE: ${SH_ROUTE:-fused-default}" > /tmp/run7k_sh.log
timeout 21600 python scripts/run_garden_7k.py --use_sh_coeff 1 \
  --exp runs/7k_garden_sh $SH_ROUTE >> /tmp/run7k_sh.log 2>&1
echo "SH RUN rc=$?" >> /tmp/run7k_sh.log
