#!/bin/bash
# Post-suite round-3 TPU sequence, run after run_suites_r3.sh prints ALL DONE:
#   1. bench.py with the depth-prefix render kernel (the round-3 perf number)
#   2. re-anchor EVERY suite's checkpoints under the current env/criteria —
#      the suites ran for ~7h while the two-detector lane test, the NPC
#      swept-path yield, and the expert retune landed, so each suite was
#      evaluated under slightly different semantics; reeval replays all
#      evals from the persisted checkpoints on one code version
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
    --suite_dir "$OUT"/core "$OUT"/conf "$OUT"/sparse "$OUT"/lam "$OUT"/clip0 "$OUT"/rest \
    >> "$OUT/reeval.log" 2>&1 && { echo "reeval OK (attempt $attempt)"; break; }
  echo "reeval attempt $attempt failed (rc=$?)" | tee -a "$OUT/reeval.log"; sleep 420
done

for attempt in 1 2; do
  timeout 3600 python -u examples/reeval.py --suite_dir "$OUT"/core \
    --only AGIL --oracle_heat --out_name report_oracleheat.json \
    >> "$OUT/oracleheat.log" 2>&1 && { echo "oracleheat OK"; break; }
  echo "oracleheat attempt $attempt failed (rc=$?)" | tee -a "$OUT/oracleheat.log"; sleep 420
done
echo POST DONE
