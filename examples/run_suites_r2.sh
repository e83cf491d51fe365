#!/bin/bash
# Round-2 experiment suites: 3 training seeds per method (VERDICT #2/#5/#7).
# Suite A: core method ordering (Original.csv parity check).
# Suite B: lambda sweep + gaze-ratio (table3) + temporal aggregation (table4).
# Expert demonstrations are collected once and cached; each seed varies
# model init + batch order. All seeds of a suite run in ONE process so the
# multi-GB device upload happens once (the TPU tunnel makes uploads cost
# 5-15 min each).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results_r2}
CACHE=$OUT/expert_cache_raw.npz
mkdir -p "$OUT"

CORE="None Reg@0.3 Reg:GMD AGIL GRIL Mask ViSaRL Contrastive None:GMD None:IGMD None:Oreo"
ABL="Reg@0.03 Reg@0.1 Reg@1.0 Reg@0.3%0.0 Reg@0.3%0.25 Reg@0.3%0.5 Reg@0.3%0.75 Reg@0.3!notemporal"

python -u examples/full_benchmark.py \
  --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
  --methods $CORE --train_seed 42 43 44 \
  --store_cache "$CACHE" --out "$OUT/core" \
  > "$OUT/core.log" 2>&1 || echo "core FAILED"

python -u examples/full_benchmark.py \
  --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
  --methods $ABL --train_seed 42 43 44 \
  --store_cache "$CACHE" --out "$OUT/abl" \
  > "$OUT/abl.log" 2>&1 || echo "abl FAILED"
echo DONE
