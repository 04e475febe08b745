#!/bin/bash
# Round-4b TPU pipeline: the stages pipeline_r4.sh lost to the rasterizer
# SMEM overflow (4 x s32[65536] scalar-prefetch operands; fixed by packing
# the per-chunk metadata into ONE s32 — see ops/rasterize.py _pack_chunk_meta).
# Ordered by VERDICT r3 priority: the garden_hard densifying run (#3/#6),
# then the SH bench (#4), then the 2.4M parity points (#5).  One TPU job at
# a time; failures skip to the next stage.
set -u
cd "$(dirname "$0")/.."
LOG=runs/r4_pipeline.log
mkdir -p runs
stamp() { echo "=== $(date +%H:%M:%S) $* ===" | tee -a "$LOG"; }
# Promote the .tmp capture unconditionally (bench.py emits JSON on SIGTERM).
promote() { [ -s "$1.tmp" ] && tail -1 "$1.tmp" > "$1"; rm -f "$1.tmp"; }

stamp "garden_hard scene generation (1.2M SH GT + noise; packed-meta fix)"
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

stamp "7k densifying run (RGB fast config, garden_hard)"
timeout 1560 python scripts/run_garden_7k.py --exp runs/7k_hard_r4 \
    --metrics_every 100 >> "$LOG" 2>&1

stamp "official bench (SH)"
timeout 1200 python bench.py --use_sh_coeff 1 > runs/bench_r4_sh.json.tmp 2>> "$LOG"
promote runs/bench_r4_sh.json

stamp "2.4M render bench (RGB, reference quality-config scale)"
timeout 900 python bench.py --phase render --n_gauss 2400000 \
    > runs/bench_r4_2m4_rgb.json.tmp 2>> "$LOG"
promote runs/bench_r4_2m4_rgb.json

stamp "2.4M render bench (SH)"
timeout 900 python bench.py --phase render --n_gauss 2400000 \
    --use_sh_coeff 1 > runs/bench_r4_2m4_sh.json.tmp 2>> "$LOG"
promote runs/bench_r4_2m4_sh.json

stamp "pipeline done"
