#!/bin/bash
# Seed extension for the confounded-degradation comparison (round 3).
#
# The re-anchor found BC/GABRIL confounded cells at +-10..13 seed std
# (per-seed Reg@0.3 conf: 50.3/26.9/48.2; None conf: 35.2/12.5/44.3),
# which leaves the "BC degrades more than GABRIL (relative)" ordering
# inside noise at 3 seeds. This runs 3 MORE training seeds (45/46/47)
# of just None + Reg@0.3, clean + confounded, on final semantics with
# the same expert cache, giving 6 seeds per cell for that comparison.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r3}
CACHE=$OUT/expert_cache_raw.npz

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

run deg_clean "$OUT/deg_clean" --methods None Reg@0.3 --train_seed 45 46 47
run deg_conf  "$OUT/deg_conf"  --methods None Reg@0.3 --train_seed 45 46 47 --confounded
echo "DEG SEEDS DONE"
