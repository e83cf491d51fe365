#!/bin/bash
# Round-5 chain E (after chain D, round boundary): measure the two
# remaining render levers on the real chip at the driver-default bench
# config (VERDICT r4 next-item 6; docs/DESIGN.md §7b lever 3 sizing:
# decimation -15% terrain, lower windows -9%, combined predicted
# ~+5% end-to-end, 24.0k -> ~25.2k). Each variant is a separate bench.py
# invocation (the flags read at trace time); baseline runs FIRST and LAST
# to bracket session drift. A Mosaic-lowering failure of the windowed loop
# only loses that variant (|| true) — bench.py's pre-flight probe guards
# the committed default.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r5}
mkdir -p "$OUT/levers"

run() {  # run <tag> [env overrides...]
  local tag=$1; shift
  echo "=== $tag $(date -u +%H:%M:%S) ==="
  timeout 2400 env "$@" python -u bench.py > "$OUT/levers/$tag.json" \
    2> "$OUT/levers/$tag.err" && cat "$OUT/levers/$tag.json" || \
    echo "$tag rc=$? (see $OUT/levers/$tag.err)"
}

run baseline1 _=_
run decimate GABRIL_FAR_DECIMATE=1
run lowerwin GABRIL_LOWER_WINDOW=1
run both GABRIL_FAR_DECIMATE=1 GABRIL_LOWER_WINDOW=1
run baseline2 _=_

echo "=== bench_train $(date -u +%H:%M:%S) ==="
timeout 2400 python -u bench_train.py > "$OUT/levers/bench_train.json" \
  2> "$OUT/levers/bench_train.err" && cat "$OUT/levers/bench_train.json" || \
  echo "bench_train rc=$?"
echo "R5E SUITES DONE"
