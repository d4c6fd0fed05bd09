#!/bin/bash
# Round-3 on-device session: trimmed, value-ordered measurement chain
# (the full run_r3.sh is 45-75 min; this fits the remaining session).
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/results_tpu_r3.txt
echo "# --- rerun $(date +%F_%T) ---" >> "$OUT"
{
  echo "# rodent_tpu round-3 sweep ($(date -u +%F)) — v5e single chip"
  echo
  echo "## cornell renderer step attribution (profile_renderer)"
  timeout 1500 python -u experiments/profile_renderer.py
  echo
  echo "## renderer: reference bench config 1920x1088 spp4 mpl20 (Msamples/s)"
  timeout 1500 python -u -m rodent_tpu.tools.benchmark --mode renderer \
      --scenes hall,crown --iters 2
  echo
  echo "## big-scene DMA prefetch A/B (exact next-pop prefetch vs blocking)"
  timeout 1500 python -u -m rodent_tpu.tools.benchmark \
      --scenes powerplant --dists primary,bounces \
      --variants hbm,hbm-nopf,giga,giga-nopf --iters 5
  echo
  echo "## traversal: scene x distribution x variant (median of N, Mrays/s)"
  timeout 1800 python -u -m rodent_tpu.tools.benchmark \
      --scenes crown,powerplant --dists primary,ao,bounces \
      --variants packet,hbm,tiled-c --iters 5
  echo
  echo "## hall renderer attribution + sort A/B"
  timeout 1200 python -u experiments/profile_renderer.py --scene hall
  echo
  echo "## packet kernel rows x multi sweep (hall)"
  timeout 1800 python -u experiments/measure_packet.py \
      --rows 8,16,32 --multi 1,2,4 --dists primary,ao
} 2>&1 | grep -v WARNING | tee -a "$OUT"
