#!/bin/bash
# Round-3 endgame perf probe, run when the TPU is otherwise idle:
#   1. confirm the official 256-world number
#   2. world-batch sweep (roadmap: 128->256 was the big lever; is 384/512?)
#   3. differential stage shares on the SAME fused loop (skip modes tag the
#      JSON "mode" so they can't be mistaken for the official number):
#      full - skip_policy = policy share; full - skip_render = render share
# Results land in $OUT/perf_probe.jsonl, one JSON line per run.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r3}
LOG=$OUT/perf_probe.jsonl
: > "$LOG"

run() { # run <label> <worlds> <steps> [env vars...]
  local label=$1 w=$2 n=$3; shift 3
  local line
  line=$(env "$@" timeout 900 python bench.py "$w" "$n" 2>>"$OUT/perf_probe.log")
  [ -n "$line" ] && echo "{\"label\": \"$label\", \"worlds\": $w, ${line#\{}" >> "$LOG"
  echo "$label: $line"
}

run full_256 256 400
run full_384 384 300
run full_512 512 200
run skip_policy_256 256 400 GABRIL_BENCH_SKIP_POLICY=1
run skip_render_256 256 400 GABRIL_BENCH_SKIP_RENDER=1
run skip_both_256 256 400 GABRIL_BENCH_SKIP_POLICY=1 GABRIL_BENCH_SKIP_RENDER=1
# kernel tile-height A/B (a5938df): fewer grid steps vs coarser prefixes
run block64_256 256 400 GABRIL_RENDER_BLOCK=64
run block128_256 256 400 GABRIL_RENDER_BLOCK=128
echo PERF PROBE DONE
