#!/bin/bash
# Round-4 on-device measurement sweep. Each section appends to its own
# dated block of results_tpu_r4.txt and FAILS LOUDLY: a section that
# crashes writes "SECTION FAILED (exit N)" instead of burying a
# traceback as a result (round-3 hygiene item, VERDICT weak #7).
cd "$(dirname "$0")/.."
# without pipefail, `cmd | tee` reports tee's exit status and a crashed
# section would silently take the success branch
set -o pipefail
OUT=benchmarks/results_tpu_r4.txt

section() {
    local name="$1"; shift
    echo "" | tee -a "$OUT"
    echo "## $name  [$(date -u +%FT%TZ)]" | tee -a "$OUT"
    # run the section; keep stderr out of the results file but surface
    # the exit code in it
    if "$@" 2>/tmp/r4_section_err.log | tee -a "$OUT"; then
        :
    else
        rc=$?
        echo "SECTION FAILED (exit $rc) — see stderr log" | tee -a "$OUT"
        tail -5 /tmp/r4_section_err.log | sed 's/^/#stderr: /' \
            | tee -a "$OUT"
    fi
}

echo "# rodent_tpu round-4 results ($(date -u +%FT%TZ))" | tee -a "$OUT"

section "gather-cliff probe (round-3 'probe pending' lever)" \
    timeout 2400 python experiments/probe_tri_gather.py

section "primary rows x multi A/B (interleaved, median of 5 blocks)" \
    timeout 2400 python experiments/ab_primary_config.py

section "ao narrow-tile sweep" \
    timeout 3000 python experiments/measure_packet.py --dists ao \
    --rows 4,8,16 --multi 2,4,8

section "bounces narrow-tile sweep" \
    timeout 3000 python experiments/measure_packet.py --dists bounces \
    --rows 4,8,16 --multi 2,4,8

section "renderer policy A/B (hall, reduced res)" \
    timeout 3600 python experiments/ab_render_policy.py --scene hall \
    --wh 960x544 --spp 2 --iters 3

section "renderer policy A/B (crown, reduced res)" \
    timeout 3600 python experiments/ab_render_policy.py --scene crown \
    --wh 960x544 --spp 2 --iters 3

section "reference-config renderer (1920x1088 spp4 mpl20, n=3)" \
    timeout 5400 python -m rodent_tpu.tools.benchmark --mode renderer \
    --width 1920 --height 1088 --spp 4 --mpl 20 --iters 3 \
    --scenes hall,crown,powerplant
