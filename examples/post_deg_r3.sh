#!/bin/bash
# Post-degradation-suite chip sequence (round 3):
#   1. jax.profiler trace of the fused bench loop (ROADMAP perf item: the
#      stage-skip subtraction says render 5.6ms / policy 4.0ms / step 3.1ms
#      per 256-world iteration — the trace attributes the step stage's
#      latency-bound tail to concrete fused kernels).
#   2. GRIL under human-statistics sparse gaze, 3 seeds: the re-anchor's
#      GRIL~BC miss (GRIL 60.9 = 1.31x BC) is attributed to the noiseless
#      dense analytic gaze; if that attribution is right, regressing the
#      sparse top-hazard fixation stream (data/gaze_stats.py) should pull
#      GRIL into the reference's band vs the same-cache BC anchor (46.4).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r3}
CACHE=$OUT/expert_cache_raw.npz

mkdir -p "$OUT/trace"
GABRIL_BENCH_PROFILE=$OUT/trace timeout 1200 python -u bench.py 256 400 \
  > "$OUT/bench_trace.json" 2>> "$OUT/bench_trace.log" \
  && echo "TRACE OK: $(cat "$OUT/bench_trace.json")"

for attempt in 1 2; do
  timeout 18000 python -u examples/full_benchmark.py \
    --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
    --store_cache "$CACHE" --out "$OUT/grilsparse" \
    --methods GRIL --sparse_gaze --train_seed 42 43 44 \
    >> "$OUT/grilsparse.log" 2>&1 && { echo "grilsparse OK (attempt $attempt)"; break; }
  echo "grilsparse attempt $attempt failed (rc=$?)" | tee -a "$OUT/grilsparse.log"
  sleep 420
done
echo "POST DEG DONE"
