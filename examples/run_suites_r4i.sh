#!/bin/bash
# Round-4 chain I (after chain H):
#   leg 1  profiler trace of the fused loop at the NEW default config
#          (1024 worlds) — the round-4 trace was 256-world; §7b's machine-
#          balance claim should be backed at the config the driver runs
#   leg 2  bench_train at bs 4000 (the config of record allows 2000-4000,
#          train_bc.yaml:10-33) — if MFU climbs past the bs-2000 45.4%,
#          round 5 can move the train benchmark's default
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}

rm -rf "$OUT/trace1024"
GABRIL_BENCH_PROFILE="$OUT/trace1024" timeout 2400 python bench.py 1024 400 \
  > "$OUT/trace1024_bench.json" 2> "$OUT/trace1024_bench.err" \
  && cat "$OUT/trace1024_bench.json"
timeout 600 python examples/trace_report.py "$OUT/trace1024" 40 \
  > "$OUT/trace1024_report.txt" 2>&1 && tail -5 "$OUT/trace1024_report.txt"

timeout 2400 python bench_train.py 4000 30 > "$OUT/bench_train_bs4000.json" \
  2>> "$OUT/bench_train.err" && cat "$OUT/bench_train_bs4000.json"
echo "R4I DONE"
