#!/bin/bash
# Round-4 chain H (after chain G frees the chip):
#   leg 1  the driver's EXACT new default bench invocation (no args ->
#          1024 worlds x 400 steps) — prove the defaults committed in
#          ac5df34 produce the expected ~23.9k on the real chip before
#          the driver runs them as BENCH_r04
#   leg 2  unet_ext: UNet gaze-predictor AGIL at seeds 45-47, same cache
#          and protocol as unet_gp seeds 42-44 -> the 6-seed
#          UNet-vs-AutoEncoder comparison VERDICT r3 item 9 asked for
#          before flipping the default predictor in round 5
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}
CACHE=results_r3/expert_cache_raw.npz

line=$(timeout 1800 python bench.py 2>"$OUT/bench_default.err" | tail -1)
echo "default_invocation: $line"
[ -n "$line" ] && echo "$line" > "$OUT/bench_default.json"

run() { # run <name> <outdir> <extra args...>
  local name=$1 outdir=$2; shift 2
  for attempt in 1 2; do
    timeout 14400 python -u examples/full_benchmark.py \
      --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
      --store_cache "$CACHE" --out "$outdir" "$@" \
      >> "$OUT/$name.log" 2>&1 && { echo "$name OK (attempt $attempt)"; return; }
    echo "$name attempt $attempt failed (rc=$?)" | tee -a "$OUT/$name.log"
    sleep 420
  done
  echo "$name FAILED twice"
}

run unet_ext "$OUT/unet_gp" --methods AGIL --gp_arch unet --train_seed 45 46 47
echo "R4H SUITES DONE"
