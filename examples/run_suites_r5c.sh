#!/bin/bash
# Round-5 chain C (after chain B): SEED DEPTH on the unresolved ordering-
# ledger row (VERDICT r4 next-item 2) — AGIL > BC, judged at 9 seeds on
# the re-anchored defaults (UNet predictor, junction traffic, human-
# statistics gaze). Chain A supplies seeds 42-44; this extends AGIL + BC
# to seeds 45-50 on the same cache. Cells land incrementally.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r5}
CACHE="$OUT/expert_cache_r5.npz"

# Budget cap re-planned 03:10 UTC (round ends ~09:51): 75 min lands seeds
# 45-47 (6 paired seeds total incl. chain A's 42-44 — the repo's ordering
# floor); resume keeps completed cells if the cap hits mid-seed.
timeout 4500 python -u examples/full_benchmark.py \
  --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
  --eval_seeds 400 401 402 403 \
  --store_cache "$CACHE" --out "$OUT/agil_depth" \
  --junction_traffic --curvature_gaze --human_gaze --gp_arch unet \
  --methods AGIL None \
  --train_seed 45 46 47 48 49 50 \
  >> "$OUT/agil_depth.log" 2>&1 \
  && echo "r5 agil_depth OK" || echo "r5 agil_depth rc=$? (completed cells kept)"
echo "R5C SUITES DONE"
