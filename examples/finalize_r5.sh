#!/bin/bash
# Round-5 closing sequence — run AFTER the chained suites drain the chip
# (everything here is CPU-only; on this 1-core box heavy CPU work starves
# the TPU tunnel relay, so never run it while a suite is training).
#
#   bash examples/finalize_r5.sh [results_r5]
#
# 1. summarize_r5 -> results_r5/SUMMARY_r5.txt (headline tables, 8-row
#    ledger, AGIL depth, semantic rung, scorecards, power analysis);
# 2. figures: methods/confounded bars + the 4-rung gaze-statistics ladder.
#    Ladder rungs: dense (r3 core2 cache), + spatial sparsity (r4
#    sparse_core), + temporal statistics (the r5 anchor — NOTE: r5 cache,
#    junction traffic ON), + semantic error (r5 misperceive, same r5
#    cache). The load-bearing rung-3 -> rung-4 comparison is same-cache;
#    the rung-2 -> rung-3 step also carries the cache change (measured
#    small: BC +2.2 +- 9.8 across the cache flip, RESULTS.md round 5).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo
OUT=${1:-results_r5}

python examples/summarize_r5.py "$OUT" | tee "$OUT/SUMMARY_r5.txt"

anchor=("$OUT"/anchor/seed*/report.json)
conf=("$OUT"/conf/seed*/report.json)
mis=("$OUT"/misperceive/seed*/report.json)
args=(--reports "${anchor[@]}" --out figs)
[ -e "${conf[0]}" ] && args+=(--conf_reports "${conf[@]}")
if [ -e "${mis[0]}" ]; then
  args+=(--ladder_dense results_r3/core2/seed*/report.json
         --ladder_sparse results_r4/sparse_core/seed*/report.json
         --ladder_human "${anchor[@]}"
         --ladder_misperceive "${mis[@]}")
fi
python -m gabril_carla_tpu.cli.figures "${args[@]}"

echo "=== levers ==="
for f in "$OUT"/levers/*.json; do
  [ -e "$f" ] && echo "$f: $(cat "$f")"
done
echo "FINALIZE DONE"
