#!/bin/bash
# Remaining round-3 on-device sections (run_r3b.sh was cut short once
# its first three sections had landed).
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/results_tpu_r3.txt
echo "# --- rerun $(date +%F_%T) ---" >> "$OUT"
{
  echo
  echo "## cornell packet-engine refinement A/B"
  timeout 1200 stdbuf -oL python -u experiments/ab_cornell_engine.py
  echo
  echo "## big-scene prefetch A/B, bounces rows"
  timeout 1200 stdbuf -oL python -u -m rodent_tpu.tools.benchmark \
      --scenes powerplant --dists bounces \
      --variants hbm,hbm-nopf --iters 5
  echo
  echo "## traversal: crown + powerplant triple (median of 5, Mrays/s)"
  timeout 1800 stdbuf -oL python -u -m rodent_tpu.tools.benchmark \
      --scenes crown,powerplant --dists primary,ao,bounces \
      --variants packet,hbm,tiled-c --iters 5
  echo
  echo "## hall renderer attribution + sort A/B"
  timeout 1200 stdbuf -oL python -u experiments/profile_renderer.py --scene hall
  echo
  echo "## packet kernel rows x multi sweep (hall)"
  timeout 1800 stdbuf -oL python -u experiments/measure_packet.py \
      --rows 8,16,32 --multi 1,2,4 --dists primary,ao
} 2>&1 | grep --line-buffered -v WARNING | tee -a "$OUT"
