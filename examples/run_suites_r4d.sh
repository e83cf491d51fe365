#!/bin/bash
# Round-4 chip chain D: full eye-tracker-statistics gaze + junction re-anchor.
#
# Chain B/C's sparse_core/sparse_conf showed the SPATIAL-only sparsification
# (one tick-accurate fixation + 35% dropout) does NOT move GRIL (59.1 vs
# dense 60.9) and lifts GMD — the kept point still tracks the top hazard
# tick-accurately, so temporally it stays a noiseless pointer. Chain D
# re-runs the misses under gaze_stats.humanize_gaze_coords (fixation HOLDS
# between lognormal-duration saccades + landing/drift noise + dropout):
#
#   leg 1  human_core  GRIL + None:GMD + Reg@0.3 --human_gaze, seeds 42-44
#   leg 2  jct_anchor  None + Reg@0.3 with ambient junction traffic ON,
#                      seeds 42-43 (VERDICT r3 item 5: report the delta)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}
CACHE=results_r3/expert_cache_raw.npz
JCACHE=results_r4/expert_cache_jct.npz
mkdir -p "$OUT"

run() { # run <name> <outdir> <extra args...>
  local name=$1 outdir=$2; shift 2
  for attempt in 1 2 3; do
    timeout 18000 python -u examples/full_benchmark.py \
      --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
      --out "$outdir" "$@" \
      >> "$OUT/$name.log" 2>&1 && { echo "$name OK (attempt $attempt)"; return; }
    echo "$name attempt $attempt failed (rc=$?)" | tee -a "$OUT/$name.log"
    sleep 300
  done
  echo "$name FAILED"
}

run human_core "$OUT/human_core" --store_cache "$CACHE" \
    --methods GRIL None:GMD Reg@0.3 --human_gaze --train_seed 42 43 44
run jct_anchor "$OUT/jct_anchor" --store_cache "$JCACHE" --junction_traffic \
    --methods None Reg@0.3 --train_seed 42 43
echo "R4D SUITES DONE"
