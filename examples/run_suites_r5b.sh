#!/bin/bash
# Round-5 chain B (after chain A): the CONFOUNDED side of the final-
# semantics re-anchor — action overlays baked into the training frames,
# two-pass predict->overlay->re-predict eval — 7 core methods x 3 seeds on
# the same r5 expert cache and flipped defaults as chain A.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r5}
CACHE="$OUT/expert_cache_r5.npz"

timeout 14400 python -u examples/full_benchmark.py \
  --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
  --eval_seeds 400 401 402 403 \
  --store_cache "$CACHE" --out "$OUT/conf" \
  --junction_traffic --curvature_gaze --human_gaze --gp_arch unet \
  --confounded \
  --methods None Reg@0.3 GRIL None:GMD Reg:GMD ViSaRL AGIL \
  --train_seed 42 43 44 \
  >> "$OUT/conf.log" 2>&1 \
  && echo "r5 conf OK" || echo "r5 conf rc=$? (completed cells kept)"
echo "R5B SUITES DONE"
