"""Summarize round-2 suite results: per-method seed means/stds + ordering
check vs the reference's published tables (draw_plot/data/Original.csv)."""

from __future__ import annotations

import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np


def main(root="results_r2"):
    root = Path(root)
    data = defaultdict(lambda: {"seen": [], "unseen": []})
    n_reports = 0
    for rep_path in sorted(root.glob("**/report.json")):
        rep = json.loads(rep_path.read_text())
        n_reports += 1
        for m, d in rep.get("methods", {}).items():
            data[m]["seen"].append(d["seen"])
            data[m]["unseen"].append(d["unseen"])
    if not data:
        print("no reports found under", root)
        return 1

    def stat(v):
        return float(np.mean(v)), float(np.std(v)), len(v)

    print(f"{n_reports} reports\n")
    print("| Method | Seen (mean ± std over seeds) | Unseen | seeds |")
    print("|---|---|---|---|")
    core = {m: v for m, v in data.items() if "%" not in m and "!" not in m}
    for m in sorted(core, key=lambda m: -np.mean(core[m]["seen"])):
        sm, ss, n = stat(core[m]["seen"])
        um, us, _ = stat(core[m]["unseen"])
        print(f"| {m} | {sm:.1f} ± {ss:.1f} | {um:.1f} ± {us:.1f} | {n} |")

    abl = {m: v for m, v in data.items() if "%" in m or "!" in m}
    if abl:
        print("\nAblations:")
        print("| Spec | Seen | Unseen | seeds |")
        print("|---|---|---|---|")
        for m in sorted(abl):
            sm, ss, n = stat(abl[m]["seen"])
            um, us, _ = stat(abl[m]["unseen"])
            print(f"| {m} | {sm:.1f} ± {ss:.1f} | {um:.1f} ± {us:.1f} | {n} |")

    # ordering parity vs the reference's published CARLA scores
    # (draw_plot/data/Original.csv: GABRIL > AGIL > BC seen; unseen gaps)
    def mean_seen(m):
        return np.mean(data[m]["seen"]) if m in data else None

    checks = []
    gab = mean_seen("Reg@0.3")
    agil = mean_seen("AGIL")
    bc = mean_seen("None")
    gril = mean_seen("GRIL")
    if None not in (gab, agil, bc):
        checks.append(("GABRIL > BC (ref: 55.2 > 47.8)", gab > bc))
        checks.append(("AGIL > BC (ref: 53.9 > 47.8)", agil > bc))
        checks.append(("GABRIL >= AGIL (ref: 55.2 > 53.9)", gab >= agil))
    if None not in (gril, bc):
        checks.append(("GRIL within 0.6x..1.2x BC (ref: 50.1 vs 47.8)",
                       0.6 * bc <= gril <= 1.2 * bc))
    if checks:
        print("\nOrdering parity vs draw_plot/data/Original.csv:")
        for name, ok in checks:
            print(f"  [{'x' if ok else ' '}] {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
