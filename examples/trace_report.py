"""Summarize a jax.profiler trace: top device ops by total time.

The bench's stage-skip subtraction (results_r3/perf_probe.jsonl) gives
stage totals; this attributes them to concrete fused kernels so perf work
targets real hotspots instead of guesses (docs/DESIGN.md §7).

    GABRIL_BENCH_PROFILE=results_r3/trace python bench.py 256 400
    python examples/trace_report.py results_r3/trace [top_n]

Reads the newest *.xplane.pb under the trace dir via jax.profiler.ProfileData
and prints per-op totals for the device plane(s), grouped by HLO op name
prefix (the fusion name up to the first dot), plus the plane totals.
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path


def main(trace_dir: str, top_n: int = 30) -> int:
    from jax.profiler import ProfileData

    files = sorted(Path(trace_dir).rglob("*.xplane.pb"), key=lambda p: p.stat().st_mtime)
    if not files:
        print(f"no *.xplane.pb under {trace_dir}", file=sys.stderr)
        return 1
    pd = ProfileData.from_file(str(files[-1]))

    for plane in pd.planes:
        name = plane.name
        # device planes carry the kernel timeline; skip pure host/python planes
        if not ("TPU" in name or "GPU" in name or "/device:" in name or "/host:CPU" == name):
            continue
        per_op = defaultdict(float)
        count = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                # group by fusion family: strip trailing .N instance suffixes
                key = ev.name.split(".")[0]
                per_op[key] += dur
                count[key] += 1
                total += dur
        if not per_op:
            continue
        print(f"\n=== plane: {name} — total {total / 1e6:.2f} ms of events ===")
        print(f"{'op family':<52} {'total ms':>9} {'%':>6} {'calls':>8}")
        for k in sorted(per_op, key=per_op.get, reverse=True)[: top_n]:
            print(f"{k[:52]:<52} {per_op[k] / 1e6:>9.2f} {100 * per_op[k] / total:>5.1f} {count[k]:>8}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "results_r3/trace",
                  int(sys.argv[2]) if len(sys.argv) > 2 else 30))
