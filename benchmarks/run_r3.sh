#!/bin/bash
# Round-3 measurement sweep (run on the real chip; ~45-75 min).
# Sections ordered by value so a mid-run cutoff still leaves the
# most important tables in benchmarks/results_tpu_r3.txt.
set -u
cd "$(dirname "$0")/.."
OUT=benchmarks/results_tpu_r3.txt
echo "# --- rerun $(date +%F_%T) ---" >> "$OUT"
{
  echo "# rodent_tpu round-3 sweep ($(date -u +%F)) — v5e single chip"
  echo "# traversal: scene x distribution x variant (median of N, Mrays/s)"
  timeout 2400 python -u -m rodent_tpu.tools.benchmark \
      --scenes hall,crown,powerplant --dists primary,ao,bounces \
      --variants packet,hbm,tiled,tiled-c --iters 5
  echo
  echo "# renderer: reference bench config 1920x1088 spp4 mpl20 (Msamples/s)"
  timeout 2400 python -u -m rodent_tpu.tools.benchmark --mode renderer \
      --scenes hall,crown --iters 3
  timeout 1800 python -u -m rodent_tpu.tools.benchmark --mode renderer \
      --scenes powerplant --iters 2
  echo
  echo "# big-scene DMA prefetch A/B (exact next-pop prefetch vs blocking)"
  timeout 1800 python -u -m rodent_tpu.tools.benchmark \
      --scenes powerplant --dists primary,bounces \
      --variants hbm,hbm-nopf,giga,giga-nopf --iters 5
  echo
  echo "# packet kernel rows x multi sweep (hall; VERDICT items 1+2)"
  # ao first: the incoherent rows are the new information; a truncated
  # sweep still leaves them in the table
  timeout 2400 python -u experiments/measure_packet.py \
      --rows 8,16,32 --multi 1,2,3,4 --dists ao,primary
} 2>&1 | grep -v WARNING | tee -a "$OUT"
