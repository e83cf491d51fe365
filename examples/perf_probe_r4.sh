#!/bin/bash
# Round-4 perf probes (VERDICT r3 item 6: "measured, not guessed").
#
# Same-session A/B ladder on an idle chip — round-3's probe numbers came
# from different sessions (full_256 22.0k vs the official 23.4k), so block
# and world-count decisions are re-measured here in ONE session, 400-step
# timed windows, before touching any default:
#   1. control @256 (block 32 default, bf16 frame ring)
#   2. render tile height 64 / 128 / 256 (output-identical, parity-tested)
#   3. world scaling 512 / 1024 at the control block
#   4. a jax.profiler trace of the fused loop + per-op attribution
# Output: results_r4/perf_probe.jsonl + results_r4/trace_report.txt
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}
mkdir -p "$OUT"
JL="$OUT/perf_probe.jsonl"
: > "$JL"

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

probe full_256      256 400   # block-64 default
probe block32_256   256 400 GABRIL_RENDER_BLOCK=32
probe block128_256  256 400 GABRIL_RENDER_BLOCK=128
probe block256_256  256 400 GABRIL_RENDER_BLOCK=256
probe full_512      512 400
probe full_1024    1024 200
probe official_256  256 100   # the driver's exact invocation (defaults)
probe official_1024 1024 100

# train-step throughput + MFU at the config of record (VERDICT r3 item 3) —
# first on-chip run of bench_train.py; recorded as BENCH_TRAIN_r04.json
timeout 1800 python bench_train.py 2000 30 > BENCH_TRAIN_r04.json \
  2> "$OUT/bench_train.err" && cat BENCH_TRAIN_r04.json || echo "bench_train FAILED"

rm -rf "$OUT/trace"
GABRIL_BENCH_PROFILE="$OUT/trace" timeout 1800 python bench.py 256 400 \
  > "$OUT/trace_bench.json" 2> "$OUT/trace_bench.err"
timeout 600 python examples/trace_report.py "$OUT/trace" 40 \
  > "$OUT/trace_report.txt" 2>&1
echo "R4 PERF PROBES DONE"
