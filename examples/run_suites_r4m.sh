#!/bin/bash
# Round-4 chain M (after chain L): collect the ROUND-5 expert cache on the
# flipped collection semantics — ambient junction traffic ON + curvature-
# anticipating (tangent-point) analytic gaze (docs/DEFAULTS_R5.md §1/§4) —
# and sanity-check it with two anchor cells (BC + GABRIL at one seed,
# eye-tracker-statistics gaze, UNet predictor config). Round 5's
# final-semantics re-anchor starts from this cache instead of paying the
# ~30 min collection + 5-15 min device upload again.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r5}
mkdir -p "$OUT"

timeout 9000 python -u examples/full_benchmark.py \
  --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
  --store_cache "$OUT/expert_cache_r5.npz" --out "$OUT/anchor_pilot" \
  --junction_traffic --curvature_gaze --human_gaze --gp_arch unet \
  --methods None Reg@0.3 --train_seed 42 \
  >> "$OUT/collect_r5.log" 2>&1 \
  && echo "r5 cache + sanity cells OK" || echo "rc=$? (cache kept if written)"
echo "R4M SUITES DONE"
