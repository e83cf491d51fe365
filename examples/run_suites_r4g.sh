#!/bin/bash
# Round-4 chain G (VERDICT r3 weak item 2): the sparse-gaze ratio sweep's
# non-monotone tail. r3 measured 48.3 -> 72.3 -> 74.2 -> 73.3 -> 68.6 over
# ratios 0/0.25/0.5/0.75/1.0 at 3 seeds, with ratio 1.0 BELOW 0.5 by ~5.6
# (stds +-3.9/+-10.3) where the reference's table3 rises monotonically to
# 100%. Extend the three top-ratio cells to 6 seeds (45-47 added to the r3
# 42-44) on the SAME expert cache so the tail's sign can be judged above
# seed noise.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}
CACHE=results_r3/expert_cache_raw.npz
mkdir -p "$OUT"

run() { # run <name> <outdir> <extra args...>
  local name=$1 outdir=$2; shift 2
  for attempt in 1 2; do
    timeout 14400 python -u examples/full_benchmark.py \
      --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
      --store_cache "$CACHE" --out "$outdir" "$@" \
      >> "$OUT/$name.log" 2>&1 && { echo "$name OK (attempt $attempt)"; return; }
    echo "$name attempt $attempt failed (rc=$?)" | tee -a "$OUT/$name.log"
    sleep 420  # wedged tunnel takes 5-10 min to clear
  done
  echo "$name FAILED twice"
}

run sparse_tail "$OUT/sparse_tail" \
  --methods Reg@0.3%0.5 Reg@0.3%0.75 Reg@0.3%1.0 --sparse_gaze \
  --train_seed 45 46 47
echo "R4G SUITES DONE"
