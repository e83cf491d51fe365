"""Calibration scorecard: our closed-loop scores vs every published row.

Reads the published driving-score tables (vendored
gabril_carla_tpu/data/benchmark/published/{Original,Confounded}.csv, copies
of the reference's draw_plot/data CSVs; VLM columns — the setting matching
this framework's analytic/pseudo gaze) and the
final-semantics re-anchor reports (results_r3/{core2,conf2}), and prints
one table per split with per-method deltas plus summary statistics
(mean absolute delta, Spearman rank correlation of the method ordering).

The env has never seen a CARLA rollout — any agreement is the
ordering-parity instrument converging, not fitting.

    python examples/calibration_scorecard.py [results_r3]
"""

from __future__ import annotations

import csv
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from gabril_carla_tpu.data.vendored import published_csv  # noqa: E402
# reference CSV label -> our method spec
METHODS = {
    "BC": "None",
    "GABRIL": "Reg@0.3",
    "GABRIL+GMD": "Reg:GMD",
    "GMD": "None:GMD",
    "AGIL": "AGIL",
    "GRIL": "GRIL",
    "ViSaRL": "ViSaRL",
}


def load_ref(name: str, col: str = "VLM") -> dict[str, dict[str, float]]:
    """Published rows for one gaze column: 'VLM' (the r3/r4 instrument) or
    'Human' (the round-5 statistics-matched instrument)."""
    out = {}
    with open(published_csv(name)) as f:
        for row in csv.DictReader(f):
            if row["Method"] in METHODS:
                out[row["Method"]] = {"seen": float(row[f"Seen_{col}"]),
                                      "unseen": float(row[f"Unseen_{col}"])}
    return out


def load_ours(root: Path, sub: str) -> dict[str, dict[str, list[float]]]:
    data = defaultdict(lambda: {"seen": [], "unseen": []})
    for rep_path in sorted((root / sub).glob("seed*/report.json")):
        rep = json.loads(rep_path.read_text())
        for m, d in rep.get("methods", {}).items():
            data[m]["seen"].append(float(d["seen"]))
            data[m]["unseen"].append(float(d["unseen"]))
    return data


def spearman(a: list[float], b: list[float]) -> float:
    ra, rb = np.argsort(np.argsort(a)), np.argsort(np.argsort(b))
    if len(a) < 2:
        return float("nan")
    return float(np.corrcoef(ra, rb)[0, 1])


def scorecard(title: str, ref: dict, ours: dict) -> None:
    rows = [(label, spec) for label, spec in METHODS.items()
            if label in ref and ours.get(spec, {}).get("seen")]
    if not rows:
        print(f"\n## {title}: no re-anchor reports yet")
        return
    print(f"\n## {title}\n")
    print("| Method | ref seen | ours seen | Δ | ref unseen | ours unseen | Δ | seeds |")
    print("|---|---|---|---|---|---|---|---|")
    deltas, triples = [], []  # (label, ref_seen, our_seen) — one source of
    # truth for both rank statistics, so label/value alignment can't drift
    # if the sort key ever changes (ADVICE r4)
    for label, spec in sorted(rows, key=lambda r: -ref[r[0]]["seen"]):
        o, r = ours[spec], ref[label]
        osm, oum = np.mean(o["seen"]), np.mean(o["unseen"])
        print(f"| {label} | {r['seen']:.1f} | {osm:.1f} | {osm - r['seen']:+.1f} "
              f"| {r['unseen']:.1f} | {oum:.1f} | {oum - r['unseen']:+.1f} "
              f"| {len(o['seen'])} |")
        deltas += [abs(osm - r["seen"]), abs(oum - r["unseen"])]
        triples.append((label, r["seen"], osm))
    ref_seen = [t[1] for t in triples]
    our_seen = [t[2] for t in triples]
    print(f"\nmean |Δ| = {np.mean(deltas):.1f} points; "
          f"seen-ordering Spearman ρ = {spearman(ref_seen, our_seen):.2f} "
          f"(n={len(rows)} methods)")
    # conditional rank statistic: GRIL and GMD consume raw gaze COORDS, and
    # their over-performance is a documented information-content artifact
    # (analytic gaze is a causal function of hazard state — RESULTS.md
    # gaze-statistics ladder, falsification survives matched statistics).
    # The remaining methods consume gaze through heatmaps/regularizers whose
    # information content matches the reference's setting.
    sub = [(r, o) for label, r, o in triples if label not in ("GRIL", "GMD")]
    if len(sub) >= 3:
        rs, os_ = zip(*sub)
        print(f"excluding the two falsified-by-information-content methods "
              f"(GRIL, GMD): Spearman ρ = {spearman(list(rs), list(os_)):.2f} "
              f"(n={len(sub)})")


def main(root="results_r3") -> int:
    root = Path(root)
    scorecard("Clean (Original.csv VLM vs core2)", load_ref("Original"),
              load_ours(root, "core2"))
    scorecard("Confounded (Confounded.csv VLM vs conf2)", load_ref("Confounded"),
              load_ours(root, "conf2"))
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
