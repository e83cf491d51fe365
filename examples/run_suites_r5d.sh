#!/bin/bash
# Round-5 chain D (after chain C): the SEMANTIC gaze-error rung (VERDICT r4
# next-item 3) — ladder rung 4. Same cache + flipped defaults as chain A,
# but the gaze stream carries semantic misperception on top of the
# eye-tracker statistics (wrong-actor fixations biased toward actors near
# the true hazard, attention lapses parking on the road —
# data/gaze_stats.py: misperceive_gaze_coords). Comparator = chain A's
# GRIL/GMD/GABRIL cells (rung 3, same cache). Decision criterion: either
# GRIL's ratio-to-BC moves toward the reference's ~1.05x (parity closes),
# or the falsification extends to supervision content with measurement.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r5}
CACHE="$OUT/expert_cache_r5.npz"

# Budget cap re-planned 03:10 UTC: 90 min covers ~3 seeds x (gp + 3 cells);
# resume keeps completed cells if the cap hits mid-seed.
timeout 5400 python -u examples/full_benchmark.py \
  --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
  --eval_seeds 400 401 402 403 \
  --store_cache "$CACHE" --out "$OUT/misperceive" \
  --junction_traffic --curvature_gaze --misperceive_gaze --gp_arch unet \
  --methods GRIL None:GMD Reg@0.3 \
  --train_seed 42 43 44 \
  >> "$OUT/misperceive.log" 2>&1 \
  && echo "r5 misperceive OK" || echo "r5 misperceive rc=$? (completed cells kept)"
echo "R5D SUITES DONE"
