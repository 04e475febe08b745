#!/bin/bash
# Round-5 TPU pipeline. Ordering encodes round-4's wall-clock lessons:
# start the 7k garden_hard run FIRST (needs ~35-40 min: first remote
# compile of the densifying train step blocks ~5-10 min with near-zero
# client CPU — it is NOT hung), then the cheap render parity points, then
# the full SH bench, then the SH 7k run if wall remains.  One TPU job at a
# time (single-tenant tunnel).  bench.py emits its JSON line even on a
# SIGTERM kill (timeout), so .tmp artifacts are promoted UNCONDITIONALLY —
# a timeout-killed stage still yields its partial JSON; every stage still
# gets a margin above its observed cost.  The 7k run is crash-resumable
# (full_state.npz + --resume) and writes summary_partial.json every ~200
# iters.
set -u
cd "$(dirname "$0")/.."
LOG=runs/r5_pipeline.log
mkdir -p runs
stamp() { echo "=== $(date +%H:%M:%S) $* ===" | tee -a "$LOG"; }
# Promote the last JSON line of a .tmp bench capture to the final artifact
# regardless of the stage's exit code (124 = timeout kill included).
promote() { [ -s "$1.tmp" ] && tail -1 "$1.tmp" > "$1"; rm -f "$1.tmp"; }

stamp "garden_hard scene (cached in /tmp from round 4 if same machine)"
timeout 900 python - >> "$LOG" 2>&1 <<'EOF'
import os, sys
sys.path.insert(0, "scripts"); sys.path.insert(0, "tests")
from gsplat_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from make_synth_scene import main, PRESETS
if not os.path.exists("/tmp/garden_hard_synth/gt_ceiling.json"):
    main("/tmp/garden_hard_synth", **PRESETS["garden_hard"])
else:
    print("scene already present")
EOF

stamp "7k densifying run (RGB fast config, garden_hard; VERDICT r3 #3/#6)"
timeout 3000 python scripts/run_garden_7k.py --exp runs/7k_hard_r5 \
    --metrics_every 100 >> "$LOG" 2>&1

stamp "2.4M render bench (RGB; budgets tune to n_pairs=4.76M NC=45294)"
timeout 1200 python bench.py --phase render --n_gauss 2400000 \
    > runs/bench_r5_2m4_rgb.json.tmp 2>> "$LOG"
promote runs/bench_r5_2m4_rgb.json

stamp "official bench (SH, all phases — the SH train it/s number)"
timeout 1800 python bench.py --use_sh_coeff 1 > runs/bench_r5_sh.json.tmp 2>> "$LOG"
promote runs/bench_r5_sh.json

stamp "2.4M render bench (SH)"
timeout 1200 python bench.py --phase render --n_gauss 2400000 \
    --use_sh_coeff 1 > runs/bench_r5_2m4_sh.json.tmp 2>> "$LOG"
promote runs/bench_r5_2m4_sh.json

stamp "7k quality run (SH, garden_hard)"
timeout 5400 python scripts/run_garden_7k.py --exp runs/7k_hard_sh_r5 \
    --use_sh_coeff 1 --metrics_every 100 >> "$LOG" 2>&1

stamp "pipeline done"
