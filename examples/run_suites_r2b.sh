#!/bin/bash
# Round-2 suites, part B (time-boxed revision; see run_suites_r2.sh for the
# full plan). Seed 42 already ran all 11 core methods; seeds 43/44 cover the
# ordering-critical methods at 3 total seeds, then ablations on the
# remaining budget.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results_r2}
CACHE=$OUT/expert_cache.npz

KEY="None Reg@0.3 AGIL GRIL None:GMD"
ABL="Reg@0.1 Reg@1.0 Reg@0.3%0.25 Reg@0.3%0.75 Reg@0.3!notemporal"

for seed in 43 44; do
  python -u examples/full_benchmark.py \
    --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
    --methods $KEY --train_seed $seed \
    --store_cache "$CACHE" --out "$OUT/core_seed$seed" \
    > "$OUT/core_seed$seed.log" 2>&1 || echo "core seed $seed FAILED"
done

for seed in 42 43; do
  python -u examples/full_benchmark.py \
    --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
    --methods $ABL --train_seed $seed \
    --store_cache "$CACHE" --out "$OUT/abl_seed$seed" \
    > "$OUT/abl_seed$seed.log" 2>&1 || echo "abl seed $seed FAILED"
done
echo DONE
