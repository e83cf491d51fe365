#!/bin/bash
# Eval-noise reduction for the degradation cells (round 3).
#
# The relative-degradation ordering rides four cells (None / Reg@0.3 ×
# clean / confounded) whose per-seed numbers carry +-25-30 per-rollout
# std over 20 rollouts. Checkpoints for the re-anchor suites and the
# seed-extension suites are still on disk, so this replays their eval
# with TWO MORE eval seeds (402/403), doubling rollouts per cell without
# retraining. Writes report_evalseeds23.json next to each report.json
# (eval seeds 400/401 stay untouched in the original reports; consumers
# average the two files for 40-rollout cells).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r3}

run() { # run <label> <args...>
  local label=$1; shift
  timeout 7200 python -u examples/reeval.py --eval_seeds 402 403 \
    --out_name report_evalseeds23.json "$@" \
    >> "$OUT/extra_evalseeds.log" 2>&1 \
    && echo "extra-eval $label OK" || echo "extra-eval $label FAILED (rc=$?)"
}

# core2 also re-evals AGIL: its clean margin over BC (52.0 vs 46.4 at
# 20 rollouts/seed) is the thinnest passing ordering
run core2     --suite_dir "$OUT/core2" --methods None Reg@0.3 AGIL
run conf2     --suite_dir "$OUT/conf2" --confounded --methods None Reg@0.3
run deg_clean --suite_dir "$OUT/deg_clean" --methods None Reg@0.3
run deg_conf  --suite_dir "$OUT/deg_conf" --confounded --methods None Reg@0.3
echo "EXTRA EVALSEEDS DONE"
