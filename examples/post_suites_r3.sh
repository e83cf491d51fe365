#!/bin/bash
# Post-suite round-3 TPU sequence, run after run_suites_r3.sh prints ALL DONE:
#   1. bench.py with the depth-prefix render kernel (the round-3 perf number)
#   2. re-anchor the STALE suites under the current env/criteria: core ran
#      before the two-detector lane test (5022538) and the NPC swept-path
#      yield (8cb6b36); conf ran before the yield fix. sparse/lam/clip0/rest
#      already ran on current semantics (suite process start times vs commit
#      times), so only core+conf need the replay
#   3. oracle-heat AGIL diagnostic: AGIL fed the analytic heat directly
#      (no frozen predictor) — isolates predictor quality from the method
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r3}

for attempt in 1 2; do
  timeout 900 python bench.py 256 400 > "$OUT/bench_r3.json" 2>"$OUT/bench_r3.log" && break
  echo "bench attempt $attempt failed" >> "$OUT/bench_r3.log"; sleep 420
done

for attempt in 1 2; do
  timeout 14400 python -u examples/reeval.py \
    --suite_dir "$OUT"/core "$OUT"/conf \
    >> "$OUT/reeval.log" 2>&1 && { echo "reeval OK (attempt $attempt)"; break; }
  echo "reeval attempt $attempt failed (rc=$?)" | tee -a "$OUT/reeval.log"; sleep 420
done

for attempt in 1 2; do
  timeout 3600 python -u examples/reeval.py --suite_dir "$OUT"/core \
    --only AGIL --oracle_heat --out_name report_oracleheat.json \
    >> "$OUT/oracleheat.log" 2>&1 && { echo "oracleheat OK"; break; }
  echo "oracleheat attempt $attempt failed (rc=$?)" | tee -a "$OUT/oracleheat.log"; sleep 420
done

# 4. rest-suite seeds lost to the round-3 relay death (seed 42 completed;
#    43/44 resume from the cache + any partial runs/)
for attempt in 1 2; do
  timeout 14400 python -u examples/full_benchmark.py \
    --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
    --store_cache "$OUT/expert_cache_raw.npz" \
    --methods Mask Contrastive None:IGMD None:Oreo \
    --train_seed 43 44 --out "$OUT/rest" \
    >> "$OUT/rest.log" 2>&1 && { echo "rest OK (attempt $attempt)"; break; }
  echo "rest attempt $attempt failed (rc=$?)" | tee -a "$OUT/rest.log"; sleep 420
done
echo POST DONE
