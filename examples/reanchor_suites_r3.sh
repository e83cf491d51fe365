#!/bin/bash
# Final-semantics re-anchor (round 3, post relay-death recovery).
#
# The round-3 core/conf suites were evaluated under the code at their
# process start (core predates the two-detector lane test 5022538 and the
# NPC swept-path yield 8cb6b36; conf predates the yield), and the suite
# checkpoints did NOT survive the container restart, so examples/reeval.py
# cannot replay them. This re-trains the full 7-method core + confounded
# suites from scratch on FINAL semantics (fresh expert cache collected on
# the final env by the rest leg), into core2/conf2 — the suite-native
# round-3 tables in results_r3/{core,conf} stay untouched for history.
# Also redoes rest seed 42 (its original run consumed the pre-yield demo
# cache; 43/44 ran on the fresh cache) so the rest table is homogeneous.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r3}
CACHE=$OUT/expert_cache_raw.npz

CONF7="None Reg@0.3 Reg:GMD AGIL GRIL ViSaRL None:GMD"

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

run core2  "$OUT/core2" --methods $CONF7 --train_seed 42 43 44
run conf2  "$OUT/conf2" --methods $CONF7 --train_seed 42 43 44 --confounded
# single-seed runs write report.json at --out itself, so stage then copy
run rest42 "$OUT/rest42" --methods Mask Contrastive None:IGMD None:Oreo --train_seed 42
if [ -f "$OUT/rest42/report.json" ]; then
  mkdir -p "$OUT/rest/seed42"
  cp "$OUT/rest42/report.json" "$OUT/rest/seed42/report.json"
fi

# oracle-heat AGIL diagnostic on the FRESH core2 checkpoints (the round-3
# post-suite leg was vacuous: the old suite checkpoints died with the
# container). Isolates frozen-predictor quality from the AGIL method.
for attempt in 1 2; do
  timeout 3600 python -u examples/reeval.py --suite_dir "$OUT/core2" \
    --only AGIL --oracle_heat --out_name report_oracleheat.json \
    >> "$OUT/oracleheat2.log" 2>&1 && { echo "oracleheat2 OK"; break; }
  echo "oracleheat2 attempt $attempt failed (rc=$?)" | tee -a "$OUT/oracleheat2.log"
  sleep 420
done
echo REANCHOR DONE
