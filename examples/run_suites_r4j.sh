#!/bin/bash
# Round-4 chain J (after chain I): extend the eye-tracker-statistics rung
# (the ledger's statistics-matched instrument) from 3 to 6 seeds. Two
# ledger rows rest on human_core at 3 seeds — the GRIL falsification
# (1.37x BC under matched statistics) and the flipped-to-pass
# GABRIL >= GMD (68.6 vs 63.1). Seeds 45-47 on the same cache/protocol
# pool with results_r4/human_core seeds 42-44 via summarize_r4's collect.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}
CACHE=results_r3/expert_cache_raw.npz

run() { # run <name> <outdir> <extra args...>
  local name=$1 outdir=$2; shift 2
  for attempt in 1 2; do
    timeout 18000 python -u examples/full_benchmark.py \
      --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
      --store_cache "$CACHE" --out "$outdir" "$@" \
      >> "$OUT/$name.log" 2>&1 && { echo "$name OK (attempt $attempt)"; return; }
    echo "$name attempt $attempt failed (rc=$?)" | tee -a "$OUT/$name.log"
    sleep 420
  done
  echo "$name FAILED twice"
}

run human_ext "$OUT/human_core" \
  --methods GRIL None:GMD Reg@0.3 --human_gaze --train_seed 45 46 47
echo "R4J SUITES DONE"
