#!/bin/bash
# After reanchor_suites_r3.sh: remediate the core2 seed-42 predictor
# collapse, then run the perf probe on the idle chip.
#
# core2 ran before the keep-best gaze-predictor fix (4746e76); its seed-42
# predictor blew up at epoch 10 (core2.log) and AGIL/ViSaRL evaluated
# against degenerate heat (8.0 / 7.6 seen; oracle-heat diagnostic on the
# same checkpoints scores 64.1 — the method was healthy, the predictor was
# not). conf2/rest42 started after the fix and are protected. This
# re-trains just the two heat-consuming methods at seed 42 with the fixed
# trainer and splices them into the core2 report with provenance (the
# original is kept as report_collapsed_predictor.json).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-results_r3}

for attempt in 1 2; do
  timeout 7200 python -u examples/full_benchmark.py \
    --train_seeds $(seq 200 219) --epochs 30 --batch_size 128 \
    --store_cache "$OUT/expert_cache_raw.npz" \
    --methods AGIL ViSaRL --train_seed 42 --out "$OUT/core2_fix42" \
    >> "$OUT/core2_fix42.log" 2>&1 && { echo "fix42 OK"; break; }
  echo "fix42 attempt $attempt failed (rc=$?)" | tee -a "$OUT/core2_fix42.log"
  sleep 420
done

python - "$OUT" <<'EOF'
import json, shutil, sys
from pathlib import Path

out = Path(sys.argv[1])
fix = out / "core2_fix42/report.json"
tgt = out / "core2/seed42/report.json"
if fix.exists() and tgt.exists():
    rep = json.loads(tgt.read_text())
    fixed = json.loads(fix.read_text())
    backup = tgt.with_name("report_collapsed_predictor.json")
    if not backup.exists():
        shutil.copy(tgt, backup)
    for m in ("AGIL", "ViSaRL"):
        if m in fixed.get("methods", {}):
            rep["methods"][m] = fixed["methods"][m]
    rep.setdefault("_fixups", {}).update({
        m: "retrained with the keep-best gaze predictor (4746e76); original "
           "collapsed-predictor cells in report_collapsed_predictor.json"
        for m in ("AGIL", "ViSaRL") if m in fixed.get("methods", {})})
    tgt.write_text(json.dumps(rep, indent=1))
    print("merged core2_fix42 into core2/seed42/report.json")
else:
    print(f"merge skipped: fix={fix.exists()} tgt={tgt.exists()}")
EOF

bash examples/perf_probe_r3.sh "$OUT"
echo POST CHAIN DONE
