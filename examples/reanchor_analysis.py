"""Same-env relative-degradation check from the CPU re-anchor run.

The round-3 core suite was evaluated on an older env than the conf suite
(two scoring/dynamics commits landed between their process starts), so the
suite-native "BC degrades more than GABRIL" relative check compared scores
across code versions. examples/reeval.py --only None Reg@0.3 --eval_steps
800 --eval_seeds 400 replays BOTH suites' checkpoints under ONE code
version (out_name report_reanchor800.json). This script computes the
reference's relative check (draw_plot/data/Confounded.csv: BC 47.8->32.8 =
-31% vs GABRIL 62.4->44.7 = -28%) from those same-env numbers.

    python examples/reanchor_analysis.py [results_r3] [report_reanchor800.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def main(root="results_r3", name="report_reanchor800.json"):
    root = Path(root)
    vals: dict[tuple[str, str, str], dict[str, float]] = {}
    for suite in ("core", "conf"):
        for rep_path in sorted((root / suite).glob("seed*/" + name)):
            rep = json.loads(rep_path.read_text())
            seed = rep_path.parent.name
            for m, d in rep.get("methods", {}).items():
                vals[(suite, seed, m)] = {
                    "seen": float(d["seen"]), "unseen": float(d["unseen"])}

    seeds = sorted({s for (_, s, _) in vals})
    methods = ("None", "Reg@0.3")
    print(f"re-anchored @800 steps, eval seed 400 ({name})\n")
    print("| Method | Clean seen | Conf seen | Δ | rel Δ |")
    print("|---|---|---|---|---|")
    rel: dict[str, float] = {}
    for m in methods:
        clean = [vals[("core", s, m)]["seen"] for s in seeds
                 if ("core", s, m) in vals]
        conf = [vals[("conf", s, m)]["seen"] for s in seeds
                if ("conf", s, m) in vals]
        if not clean or not conf:
            print(f"| {m} | (incomplete: {len(clean)} clean / {len(conf)} conf seeds) |")
            continue
        cm, fm = float(np.mean(clean)), float(np.mean(conf))
        rel[m] = (fm - cm) / cm
        print(f"| {m} | {cm:.1f} ± {np.std(clean):.1f} (n={len(clean)}) "
              f"| {fm:.1f} ± {np.std(conf):.1f} (n={len(conf)}) "
              f"| {fm - cm:+.1f} | {100 * rel[m]:+.0f}% |")
    if len(rel) == 2:
        bc, gab = rel["None"], rel["Reg@0.3"]
        print(f"\nreference check (BC degrades more than GABRIL, relatively):"
              f" BC {100*bc:+.0f}% vs GABRIL {100*gab:+.0f}% -> "
              + ("REPRODUCED" if bc < gab else "not reproduced"))
        print("(ref: BC -31% vs GABRIL -28%; GABRIL>BC confounded is the"
              " other half, checked in summarize_r3)")
    # per-seed detail
    print("\nper-seed seen scores:")
    for s in seeds:
        row = [f"{m} {suite}: " + (f"{vals[(suite, s, m)]['seen']:.1f}"
               if (suite, s, m) in vals else "—")
               for m in methods for suite in ("core", "conf")]
        print(f"  {s}: " + " | ".join(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
