#!/bin/bash
# Round-4 chain K (after chain J): third seed for the junction-traffic
# re-anchor — the reported BC Δ+9.0 / GABRIL Δ+3.4 deltas (RESULTS.md
# "Ambient junction traffic") rest on 2 seeds; seed 44 pools via
# summarize_r4's collect into results_r4/jct_anchor.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}
JCACHE=results_r4/expert_cache_jct.npz

run() { # run <name> <outdir> <extra args...>
  local name=$1 outdir=$2; shift 2
  for attempt in 1 2; do
    timeout 18000 python -u examples/full_benchmark.py \
      --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
      --store_cache "$JCACHE" --out "$outdir" "$@" \
      >> "$OUT/$name.log" 2>&1 && { echo "$name OK (attempt $attempt)"; return; }
    echo "$name attempt $attempt failed (rc=$?)" | tee -a "$OUT/$name.log"
    sleep 420
  done
  echo "$name FAILED twice"
}

run jct_ext "$OUT/jct_anchor" --junction_traffic \
  --methods None Reg@0.3 --train_seed 44
echo "R4K SUITES DONE"
