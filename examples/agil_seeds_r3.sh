#!/bin/bash
# AGIL seed extension (round 3): the re-anchor's AGIL > BC clean ordering
# passes at 52.0 vs 46.4 but with ±8.2 AGIL seed std — the thinnest
# passing check. 3 more training seeds (45/46/47) take it to 6 seeds
# (pool with results_r3/core2 AGIL).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r3}
CACHE=$OUT/expert_cache_raw.npz

for attempt in 1 2; do
  timeout 18000 python -u examples/full_benchmark.py \
    --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
    --store_cache "$CACHE" --out "$OUT/agil_seeds" \
    --methods AGIL --train_seed 45 46 47 \
    >> "$OUT/agil_seeds.log" 2>&1 && { echo "agil_seeds OK (attempt $attempt)"; break; }
  echo "agil_seeds attempt $attempt failed (rc=$?)" | tee -a "$OUT/agil_seeds.log"
  sleep 420
done
echo "AGIL SEEDS DONE"
