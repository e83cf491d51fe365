#!/bin/bash
# Round-4 chain F: trimmed remainder of chain E after the block-128/256
# probes proved too compile-expensive for the time left (Mosaic unrolls the
# depth prefixes per tile class; ~12 min compile each at block>=128, vs
# <2% throughput spread between 32 and 64 in the same-session A/B).
#
#   leg 1  world-scaling probes (512 / 1024) + the driver-default
#          invocation at 1024, appended to results_r4/perf_probe.jsonl
#   leg 2  bench_train.py first on-chip run -> BENCH_TRAIN_r04.json
#   leg 3  fused-loop profiler trace + per-op report
#   leg 4  unet_gp (VERDICT item 9) then agil_ext (weak item 3)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}
CACHE=results_r3/expert_cache_raw.npz
JL="$OUT/perf_probe.jsonl"

probe() { # probe <label> <worlds> <steps> [env pairs...]
  local label=$1 worlds=$2 steps=$3; shift 3
  local line
  line=$(env "$@" timeout 1800 python bench.py "$worlds" "$steps" 2>"$OUT/probe_$label.err" | tail -1)
  if [ -n "$line" ]; then
    echo "{\"label\": \"$label\", $(echo "$line" | cut -c2-)" >> "$JL"
    echo "$label: $line"
  else
    echo "$label FAILED (see $OUT/probe_$label.err)"
  fi
}

probe full_512      512 400
probe full_1024    1024 200
probe official_1024 1024 100

timeout 1800 python bench_train.py 2000 30 > BENCH_TRAIN_r04.json \
  2> "$OUT/bench_train.err" && cat BENCH_TRAIN_r04.json || echo "bench_train FAILED"

rm -rf "$OUT/trace"
GABRIL_BENCH_PROFILE="$OUT/trace" timeout 1800 python bench.py 256 400 \
  > "$OUT/trace_bench.json" 2> "$OUT/trace_bench.err"
timeout 600 python examples/trace_report.py "$OUT/trace" 40 \
  > "$OUT/trace_report.txt" 2>&1
echo "PROBES DONE $(date -u +%H:%M)"

run() { # run <name> <outdir> <extra args...>
  local name=$1 outdir=$2; shift 2
  timeout 10800 python -u examples/full_benchmark.py \
    --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
    --out "$outdir" "$@" \
    >> "$OUT/$name.log" 2>&1 && echo "$name OK" || echo "$name FAILED (rc=$?)"
}

run unet_gp "$OUT/unet_gp" --store_cache "$CACHE" \
    --methods AGIL --gp_arch unet --train_seed 42 43
run agil_ext "$OUT/agil_ext" --store_cache "$CACHE" \
    --methods AGIL --train_seed 45 46 47
echo "R4F SUITES DONE"
