#!/bin/bash
# Supervise the crash-resumable 7k run: relaunch through transient TPU
# worker crashes (the axon tunnel's remote worker can restart mid-run),
# but stop if two consecutive attempts make no iteration progress — that
# pattern means a deterministic kernel fault, not infra flake.
#
# Usage: setsid nohup bash scripts/run7k_supervised.sh EXP_DIR > LOG 2>&1 &
set -u
cd "$(dirname "$0")/.."
EXP=${1:-runs/7k_garden_r3}
export PYTHONPATH=/root/.axon_site:/root/repo
LAST_ITER=-1
STALLS=0
for attempt in $(seq 1 40); do
  if [ -f "$EXP/summary.json" ]; then echo "[sup] summary exists — done"; break; fi
  echo "[sup] attempt $attempt $(date -u +%H:%M:%S)"
  python scripts/run_garden_7k.py --exp "$EXP"
  rc=$?
  if [ -f "$EXP/summary.json" ]; then echo "[sup] finished rc=$rc"; break; fi
  IT=$(grep -oE '^iter [0-9]+' "$EXP/train.log" | tail -1 | cut -d' ' -f2)
  IT=${IT:-0}
  if [ "$IT" -le "$LAST_ITER" ]; then
    STALLS=$((STALLS+1))
    echo "[sup] no progress (iter $IT <= $LAST_ITER), stall #$STALLS"
    if [ "$STALLS" -ge 2 ]; then
      echo "[sup] deterministic fault suspected — stopping"; break
    fi
  else
    STALLS=0
  fi
  LAST_ITER=$IT
  echo "[sup] rc=$rc at iter $IT; retrying in 180s"
  sleep 180
done
