#!/bin/bash
# Round-4 TPU pipeline, ordered by artifact importance (wall-clock may run
# out): the garden_hard 7k densifying run (VERDICT r3 #3/#6), official
# bench artifacts, quality-scale (2.4M) parity points, then the SH 7k run.
# One TPU job at a time (the tunnel is single-tenant); each stage appends
# to runs/r4_pipeline.log and failures skip to the next stage.
set -u
cd "$(dirname "$0")/.."
LOG=runs/r4_pipeline.log
mkdir -p runs
stamp() { echo "=== $(date +%H:%M:%S) $* ===" | tee -a "$LOG"; }

stamp "garden_hard scene generation (1.2M SH GT + noise)"
timeout 3600 python - >> "$LOG" 2>&1 <<'EOF'
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

stamp "7k densifying run (RGB fast config, garden_hard)"
timeout 5400 python scripts/run_garden_7k.py --exp runs/7k_hard_r4 \
    --metrics_every 100 >> "$LOG" 2>&1

stamp "official bench (RGB, all phases; deployment preset is auto)"
timeout 2400 python bench.py > runs/bench_r4_rgb.json.tmp 2>> "$LOG" \
    && tail -1 runs/bench_r4_rgb.json.tmp > runs/bench_r4_rgb.json \
    && rm -f runs/bench_r4_rgb.json.tmp

stamp "official bench (SH)"
timeout 2400 python bench.py --use_sh_coeff 1 > runs/bench_r4_sh.json.tmp 2>> "$LOG" \
    && tail -1 runs/bench_r4_sh.json.tmp > runs/bench_r4_sh.json \
    && rm -f runs/bench_r4_sh.json.tmp

stamp "2.4M render bench (RGB, reference quality-config scale)"
timeout 2400 python bench.py --phase render --n_gauss 2400000 \
    > runs/bench_r4_2m4_rgb.json.tmp 2>> "$LOG" \
    && tail -1 runs/bench_r4_2m4_rgb.json.tmp > runs/bench_r4_2m4_rgb.json \
    && rm -f runs/bench_r4_2m4_rgb.json.tmp

stamp "2.4M render bench (SH)"
timeout 3000 python bench.py --phase render --n_gauss 2400000 \
    --use_sh_coeff 1 > runs/bench_r4_2m4_sh.json.tmp 2>> "$LOG" \
    && tail -1 runs/bench_r4_2m4_sh.json.tmp > runs/bench_r4_2m4_sh.json \
    && rm -f runs/bench_r4_2m4_sh.json.tmp

stamp "7k quality run (SH, garden_hard)"
timeout 7200 python scripts/run_garden_7k.py --exp runs/7k_hard_sh_r4 \
    --use_sh_coeff 1 --metrics_every 100 >> "$LOG" 2>&1

stamp "pipeline done"
