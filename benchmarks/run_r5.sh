#!/bin/bash
# Round-5 on-device measurement set (reproduction script). The round
# was driven interactively session-by-session; this script replays the
# full measurement program in order. Each section appends to
# results_tpu_r5.txt and fails loudly (round-3 hygiene).
cd "$(dirname "$0")/.."
set -o pipefail
OUT=benchmarks/results_tpu_r5.txt

section() {
    local name="$1"; shift
    echo "" | tee -a "$OUT"
    echo "## $name  [$(date -u +%FT%TZ)]" | tee -a "$OUT"
    "$@" 2>&1 | grep -v WARNING | tee -a "$OUT" \
        || echo "SECTION FAILED (exit $?)" | tee -a "$OUT"
}

# 1. carry-top kernel A/B (VERDICT item 1): legacy vs ct-fold/ct-sort
#    bodies at 24x1/32x1 on hall primary
section "carry-top A/B" python -u experiments/measure_ct.py

# 2. Mosaic op-histogram decomposition of the per-pop cost
section "asm audit" python -u experiments/asm_audit.py

# 3. big-scene leaf-pop attack (item 3): Tri-packet x leaf_cost sweep
#    on powerplant-4.3M, then same-scale 12.5M with the winning build
section "bigscene leaf sweep" python -u experiments/sweep_bigscene_leaf.py
section "bigscene 12.5M" python -u experiments/bigscene_12m.py

# 4. dual-queue waterfall + sub-batch honest timing (item 2)
section "tiled waterfall" python -u experiments/waterfall_tiled.py
section "sub-batch depth probe" python -u experiments/probe_sb_depth.py

# 5. tree arity x Tri-packet sweep on the incoherent rows (select-chain
#    closure)
section "arity sweep" python -u experiments/sweep_arity_tiled.py

# 6. crown primary mitigation grid (item 7): sort keys x tile configs
section "crown grid" python -u experiments/probe_crown_sort.py

# 7. renderer: pool rule + reference-config rows + mathall stage split
#    (item 4)
section "render pools" python -u experiments/ab_render_policy.py --pools
section "render rows" python -u -m rodent_tpu.tools.benchmark \
    --mode renderer --scenes mathall,hall,crown --iters 5
section "mathall stage split" python -u experiments/profile_renderer.py \
    --scene mathall

# 8. goldens (regenerate converged films; run once, then gate via tests)
# section "goldens" python -u experiments/make_goldens.py

# 9. headline + canonical rows
section "bench.py" python -u bench.py
section "powerplant-2M" python -u -m rodent_tpu.tools.benchmark \
    --scenes powerplant --dists primary --variants hbm --iters 5
section "crown CLI" python -u -m rodent_tpu.tools.benchmark \
    --scenes crown --dists primary --variants packet --iters 5
