#!/bin/bash
# Round-4 chip chain E: runs once chain D (human_core + jct_anchor) frees
# the chip.
#
#   leg 0  wait for chain D's pid file to exit
#   leg 1  perf probes (examples/perf_probe_r4.sh) — needs an idle chip
#   leg 2  unet_gp    AGIL with the UNet gaze-predictor backbone, seeds
#                     42-43 (VERDICT r3 item 9: a trained-UNet comparison
#                     cell vs the AutoEncoder AGIL cells in results_r3)
#   leg 3  agil_ext   AGIL AutoEncoder, fresh seeds 45-47 (VERDICT r3
#                     weak item 3: 6-seed AGIL margin; defaults unchanged
#                     since the r3 re-anchor so cells pool with core2/rest)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r4}
CACHE=results_r3/expert_cache_raw.npz
mkdir -p "$OUT"

if [ -f /tmp/chain_d.pid ]; then
  DPID=$(cat /tmp/chain_d.pid)
  while kill -0 "$DPID" 2>/dev/null; do sleep 60; done
fi
echo "chain D finished, starting probes $(date -u +%H:%M)"

bash examples/perf_probe_r4.sh "$OUT"

run() { # run <name> <outdir> <extra args...>
  local name=$1 outdir=$2; shift 2
  for attempt in 1 2; do
    timeout 10800 python -u examples/full_benchmark.py \
      --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
      --out "$outdir" "$@" \
      >> "$OUT/$name.log" 2>&1 && { echo "$name OK (attempt $attempt)"; return; }
    echo "$name attempt $attempt failed (rc=$?)" | tee -a "$OUT/$name.log"
    sleep 120
  done
  echo "$name FAILED"
}

run unet_gp "$OUT/unet_gp" --store_cache "$CACHE" \
    --methods AGIL --gp_arch unet --train_seed 42 43
run agil_ext "$OUT/agil_ext" --store_cache "$CACHE" \
    --methods AGIL --train_seed 45 46 47
echo "R4E SUITES DONE"
