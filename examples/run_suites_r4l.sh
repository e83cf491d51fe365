#!/bin/bash
# Round-4 chain L (after chain K): flipped-defaults PILOT for the round-5
# final re-anchor (docs/ROADMAP.md round-5 priority 1). The three candidate
# default flips — ambient junction traffic, eye-tracker-statistics gaze,
# UNet gaze predictor — have each been measured ALONE; this is the first
# end-to-end run of the combination. 3 seeds x 4 methods (BC, GABRIL, AGIL,
# GMD) on the junction expert cache: proves the flag stack composes, warms
# the server-side compile caches the round-5 re-anchor will hit, and gives
# an early read on where the flipped method table lands. NOT an ordering
# claim (that needs >=6 seeds; ROADMAP standing notes) — a pilot.
#
# Single attempt, sized to the chip window between chain K and round end;
# cells that complete are kept by full_benchmark's report.json resume, so
# round 5 extends rather than restarts.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}
JCACHE=results_r4/expert_cache_jct.npz

timeout 12000 python -u examples/full_benchmark.py \
  --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
  --store_cache "$JCACHE" --out "$OUT/flip_pilot" \
  --junction_traffic --human_gaze --gp_arch unet \
  --methods None Reg@0.3 AGIL None:GMD --train_seed 42 43 44 \
  >> "$OUT/flip_pilot.log" 2>&1 \
  && echo "flip_pilot OK" || echo "flip_pilot rc=$? (completed cells kept)"
echo "R4L SUITES DONE"
