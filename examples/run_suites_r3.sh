#!/bin/bash
# Round-3 experiment suites (VERDICT round-2 items 1/2/5), in priority order:
#   A  clean core, 7 Confounded.csv methods x 3 seeds (the clean anchor for
#      the confounded deltas; round-2 clean numbers are on the OLD env)
#   B  CONFOUNDED benchmark, same 7 methods x 3 seeds (the reference's
#      headline robustness table, entirely un-reproduced until now)
#   C  sparse-gaze ratio ablation (table-3 control: dense analytic gaze
#      saturates; sparse human-like gaze should reproduce the rising trend)
#   D  lambda completion at 3 seeds + temporal-OFF + clip=0 de-confound
#   E  remaining core methods (Mask/Contrastive/IGMD/Oreo) x 3 seeds
# Expert demos are collected once into the cache; each suite runs all its
# seeds in ONE process (the device upload through the TPU tunnel costs
# 5-15 min). Every invocation is wrapped in timeout + one retry: the tunnel
# wedges mid-run every few hours (resume reuses the cache + done reports).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r3}
CACHE=$OUT/expert_cache_raw.npz
mkdir -p "$OUT"

CONF7="None Reg@0.3 Reg:GMD AGIL GRIL ViSaRL None:GMD"
SPARSE="Reg@0.3%0.0 Reg@0.3%0.25 Reg@0.3%0.5 Reg@0.3%0.75 Reg@0.3%1.0"
LAM="Reg@0.03 Reg@0.1 Reg@1.0 Reg@0.3!notemporal"
CLIP0="Reg@0.03 Reg@0.3 Reg@1.0"
REST="Mask Contrastive None:IGMD None:Oreo"

run() { # run <name> <extra args...>
  local name=$1; shift
  for attempt in 1 2; do
    timeout 14400 python -u examples/full_benchmark.py \
      --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
      --store_cache "$CACHE" "$@" \
      >> "$OUT/$name.log" 2>&1 && { echo "$name OK (attempt $attempt)"; return; }
    echo "$name attempt $attempt failed (rc=$?)" | tee -a "$OUT/$name.log"
    sleep 420  # wedged tunnel takes 5-10 min to clear
  done
  echo "$name FAILED twice"
}

run core  --methods $CONF7  --train_seed 42 43 44 --out "$OUT/core"
run conf  --methods $CONF7  --train_seed 42 43 44 --out "$OUT/conf" --confounded
run sparse --methods $SPARSE --train_seed 42 43 44 --out "$OUT/sparse" --sparse_gaze
run lam   --methods $LAM    --train_seed 42 43 44 --out "$OUT/lam"
run clip0 --methods $CLIP0  --train_seed 42 43 44 --out "$OUT/clip0" --clip_norm 0
run rest  --methods $REST   --train_seed 42 43 44 --out "$OUT/rest"
echo ALL DONE
