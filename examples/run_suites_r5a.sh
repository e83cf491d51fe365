#!/bin/bash
# Round-5 chain A: the FINAL-SEMANTICS RE-ANCHOR (VERDICT r4 next-item 1).
# Fresh expert cache on the flipped collection semantics — ambient junction
# traffic ON (incl. the r5 ego-yellow crosser hold fix) + curvature-
# anticipating analytic gaze — then the full 11-method table at 3 training
# seeds with eye-tracker-statistics gaze and the UNet gaze predictor
# (docs/DEFAULTS_R5.md §1-4). Gaze-predictor checkpointing runs under the
# round-5 collapse-gated protocol (train/loop.py COLLAPSE_GATE), retiring
# the keep-best divergence (VERDICT r4 next-item 5).
#
# Protocol: 200 expert demos (seeds 200-219), 30 epochs, batch 128,
# eval = 40 closed-loop rollouts per split (10 routes x eval seeds
# 400-403; doubled from the r3/r4 20-rollout protocol to tighten the
# per-cell mean — this anchor starts a new comparability window anyway).
# Cells land incrementally via full_benchmark's report.json resume.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r5}
mkdir -p "$OUT"
CACHE="$OUT/expert_cache_r5.npz"

timeout 19800 python -u examples/full_benchmark.py \
  --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
  --eval_seeds 400 401 402 403 \
  --store_cache "$CACHE" --out "$OUT/anchor" \
  --junction_traffic --curvature_gaze --human_gaze --gp_arch unet \
  --methods None Reg@0.3 GRIL None:GMD Reg:GMD ViSaRL AGIL None:IGMD Mask None:Oreo Contrastive \
  --train_seed 42 43 44 \
  >> "$OUT/anchor.log" 2>&1 \
  && echo "r5 anchor OK" || echo "r5 anchor rc=$? (completed cells kept)"
echo "R5A SUITES DONE"
