#!/bin/bash
# Round-4 chip chain, continuation C (after the 2026-08-19 relay deaths).
# sparse_core completed in chain B; this picks up at sparse_conf (seed 42 cell
# finished — cell-level resume inside full_benchmark.py makes re-entry safe)
# and then runs sparse_rest.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}
CACHE=results_r3/expert_cache_raw.npz
mkdir -p "$OUT"

run() { # run <name> <outdir> <extra args...>
  local name=$1 outdir=$2; shift 2
  for attempt in 1 2 3; do
    timeout 18000 python -u examples/full_benchmark.py \
      --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
      --store_cache "$CACHE" --out "$outdir" "$@" \
      >> "$OUT/$name.log" 2>&1 && { echo "$name OK (attempt $attempt)"; return; }
    echo "$name attempt $attempt failed (rc=$?)" | tee -a "$OUT/$name.log"
    sleep 300
  done
  echo "$name FAILED"
}

run sparse_conf "$OUT/sparse_conf"   --methods Reg@0.3 --sparse_gaze --confounded --train_seed 42 43 44
run sparse_rest "$OUT/sparse_rest"   --methods Reg:GMD AGIL ViSaRL Mask Contrastive --sparse_gaze --train_seed 42 43 44
echo "R4C SUITES DONE"
