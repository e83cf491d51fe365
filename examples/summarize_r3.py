"""Summarize round-3 suites: clean core, CONFOUNDED deltas, sparse-gaze
ratio curve, lambda/clip ablations — with the reference-ordering checks.

Reads results_r3/{core,conf,sparse,lam,clip0,rest}/**/report.json (one per
training seed, written by examples/full_benchmark.py) and prints the
RESULTS.md tables. The confounded section checks the reference's two
headline orderings (draw_plot/data/Confounded.csv): BC degrades MORE than
GABRIL under confounding, and GABRIL > BC on the confounded eval.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np


def collect(root: Path, sub: str):
    data = defaultdict(lambda: {"seen": [], "unseen": []})
    for rep_path in sorted((root / sub).glob("**/report.json")):
        # prefer the re-anchored eval (examples/reeval.py re-scores saved
        # checkpoints under the final criteria code) when present
        reeval = rep_path.with_name("report_reeval.json")
        rep = json.loads((reeval if reeval.exists() else rep_path).read_text())
        # extra eval seeds (examples/extra_evalseeds_r3.sh, eval seeds
        # 402/403): average the two 20-rollout means into one 40-rollout
        # per-seed sample for whichever methods were re-evaluated
        extra_path = rep_path.with_name("report_evalseeds23.json")
        extra = (json.loads(extra_path.read_text()).get("methods", {})
                 if extra_path.exists() else {})
        for m, d in rep.get("methods", {}).items():
            for k in ("seen", "unseen"):
                v = d[k]
                if m in extra:
                    v = 0.5 * (v + extra[m][k])
                data[m][k].append(v)
    return data


def stat(v):
    return float(np.mean(v)), float(np.std(v)), len(v)


def table(data, title):
    if not data:
        return
    print(f"\n### {title}\n")
    print("| Method | Seen (mean ± std over seeds) | Unseen | seeds |")
    print("|---|---|---|---|")
    for m in sorted(data, key=lambda m: -np.mean(data[m]["seen"])):
        sm, ss, n = stat(data[m]["seen"])
        um, us, _ = stat(data[m]["unseen"])
        print(f"| {m} | {sm:.1f} ± {ss:.1f} | {um:.1f} ± {us:.1f} | {n} |")


def main(root="results_r3"):
    root = Path(root)
    core = collect(root, "core")
    for extra in ("rest", "lam"):
        for m, d in collect(root, extra).items():
            core[m]["seen"] += d["seen"]
            core[m]["unseen"] += d["unseen"]
    conf = collect(root, "conf")
    sparse = collect(root, "sparse")
    clip0 = collect(root, "clip0")

    # Final-semantics re-anchor (examples/reanchor_suites_r3.sh): core2/conf2
    # retrain the 7-method suites on the final env with fresh post-yield
    # expert demos. When present they carry the ordering checks; the
    # suite-native core/conf tables (older demo cache, per-suite code
    # versions) stay printed for history.
    core2 = collect(root, "core2")
    conf2 = collect(root, "conf2")
    if core2:
        # rest + the AGIL seed extension run on the same fresh cache
        for extra2 in ("rest", "agil_seeds"):
            for m, d in collect(root, extra2).items():
                core2[m]["seen"] += d["seen"]
                core2[m]["unseen"] += d["unseen"]
        table(core2, "Clean core — FINAL-SEMANTICS RE-ANCHOR (core2 + rest)")
        table(conf2, "CONFOUNDED — FINAL-SEMANTICS RE-ANCHOR (conf2)")
        core_checks, conf_checks = core2, conf2
        label = "final-semantics re-anchor"
    else:
        core_checks, conf_checks = core, conf
        label = "suite-native"

    table({m: v for m, v in core.items() if "%" not in m and "!" not in m},
          "Clean core (suite-native round-3)")
    table({m: v for m, v in core.items() if "!" in m}, "Temporal ablation")
    table(conf, "CONFOUNDED (suite-native, two-pass eval)")
    table(sparse, "Sparse-gaze ratio (table-3 control)")
    table(clip0, "clip_norm=0 lambda column")

    def mean_seen(data, m):
        return float(np.mean(data[m]["seen"])) if m in data and data[m]["seen"] else None

    # degradation seed extension (examples/degradation_seeds_r3.sh): extra
    # None/Reg@0.3 seeds sharpening the noisiest check — pool them into the
    # degradation comparison when present
    deg_clean, deg_conf = collect(root, "deg_clean"), collect(root, "deg_conf")
    pooled_c = pooled_f = None
    if deg_clean and core2:
        pooled_c = {m: {k: core2[m][k] + deg_clean.get(m, {k: []})[k] for k in ("seen", "unseen")}
                    for m in ("None", "Reg@0.3")}
        pooled_f = {m: {k: conf2[m][k] + deg_conf.get(m, {k: []})[k] for k in ("seen", "unseen")}
                    for m in ("None", "Reg@0.3")}
        table(pooled_c, "Degradation cells POOLED (core2 + deg_clean)")
        table(pooled_f, "Degradation cells POOLED confounded (conf2 + deg_conf)")
        n_pool = len(pooled_c["None"]["seen"])
        print(f"\n(degradation comparison pooled over {n_pool} seeds per cell)")
        # paired-by-seed view: clean and confounded runs share training
        # seeds (42..44 re-anchor, 45..47 extension), so the relative
        # degradation is a per-seed quantity — report the pairs and the
        # sign count (more power than comparing pooled means)
        n_pair = min(len(pooled_c["None"]["seen"]), len(pooled_f["None"]["seen"]),
                     len(pooled_c["Reg@0.3"]["seen"]), len(pooled_f["Reg@0.3"]["seen"]))
        if n_pair >= 3:
            rel = {}
            for m in ("None", "Reg@0.3"):
                cl = np.asarray(pooled_c[m]["seen"][:n_pair])
                cf = np.asarray(pooled_f[m]["seen"][:n_pair])
                rel[m] = (cl - cf) / np.maximum(cl, 1e-6)
            wins = int(np.sum(rel["None"] > rel["Reg@0.3"]))
            print(f"per-seed relative degradation (clean->confounded, {n_pair} paired seeds):")
            print("  BC    : " + " ".join(f"{v:+.0%}" for v in rel["None"]))
            print("  GABRIL: " + " ".join(f"{v:+.0%}" for v in rel["Reg@0.3"]))
            print(f"  BC degrades more in {wins}/{n_pair} seed pairs")

    print(f"\nOrdering parity vs the reference's published tables ({label}):")
    checks = []
    core, conf = core_checks, conf_checks
    gab, agil, bc = (mean_seen(core, k) for k in ("Reg@0.3", "AGIL", "None"))
    gril = mean_seen(core, "GRIL")
    if None not in (gab, agil, bc):
        checks.append(("GABRIL > BC clean (Original.csv: 62.4 > 47.8)", gab > bc))
        checks.append(("AGIL > BC clean (Original.csv: 53.9 > 47.8)", agil > bc))
        checks.append(("GABRIL >= AGIL clean (Original.csv: 62.4 > 56.2)", gab >= agil))
    if None not in (gril, bc):
        checks.append(("GRIL within 0.6x..1.2x BC (Original.csv: 50.1 vs 47.8)",
                       0.6 * bc <= gril <= 1.2 * bc))
    if pooled_c is not None:
        gab, bc = mean_seen(pooled_c, "Reg@0.3"), mean_seen(pooled_c, "None")
        cgab, cbc = mean_seen(pooled_f, "Reg@0.3"), mean_seen(pooled_f, "None")
    else:
        cgab, cbc = mean_seen(conf, "Reg@0.3"), mean_seen(conf, "None")
    if None not in (cgab, cbc):
        checks.append(("GABRIL > BC confounded (Confounded.csv: 44.7 > 32.8)", cgab > cbc))
        if None not in (gab, bc):
            d_bc, d_gab = bc - cbc, gab - cgab
            checks.append((f"BC degrades more than GABRIL "
                           f"(dBC {d_bc:+.1f} vs dGABRIL {d_gab:+.1f}; "
                           "Confounded.csv: -15.0 vs -17.6 abs, -31% vs -28% rel)",
                           d_bc / max(bc, 1e-6) > d_gab / max(gab, 1e-6)))
    # table-3 rising-trend check on the sparse-gaze run
    ratios = sorted((m for m in sparse if "%" in m),
                    key=lambda m: float(m.split("%")[1]))
    if len(ratios) >= 3:
        vals = [np.mean(sparse[m]["seen"]) for m in ratios]
        checks.append((f"sparse-gaze ratio rising (table3: 25.4->33.9): "
                       + " -> ".join(f"{v:.1f}" for v in vals),
                       vals[-1] > vals[0]))
    for name, ok in checks:
        print(f"  [{'x' if ok else ' '}] {name}")

    # unseen-side orderings (informational — kept separate so the headline
    # seven stay comparable across rounds)
    def mean_unseen(data, m):
        return float(np.mean(data[m]["unseen"])) if m in data and data[m]["unseen"] else None

    ugab, uagil, ubc = (mean_unseen(core, k) for k in ("Reg@0.3", "AGIL", "None"))
    ucgab, ucbc = mean_unseen(conf_checks, "Reg@0.3"), mean_unseen(conf_checks, "None")
    unseen_checks = []
    if None not in (ugab, ubc):
        unseen_checks.append(("GABRIL > BC unseen (Original.csv: 30.2 > 12.2)", ugab > ubc))
    if None not in (uagil, ubc):
        unseen_checks.append(("AGIL > BC unseen (Original.csv: 28.7 > 12.2)", uagil > ubc))
    if None not in (ucgab, ucbc):
        unseen_checks.append(("GABRIL > BC confounded unseen (Confounded.csv: 26.8 > 8.8)",
                              ucgab > ucbc))
    if unseen_checks:
        print("Unseen-side orderings (informational):")
        for name, ok in unseen_checks:
            print(f"  [{'x' if ok else ' '}] {name}")

    # GRIL under human-statistics sparse gaze (examples/post_deg_r3.sh):
    # tests the attribution for the GRIL ordering miss — regressing the
    # noiseless dense analytic gaze is too easy, so GRIL over-performs;
    # under the sparse top-hazard stream it should fall into the
    # reference's band vs the same-cache BC anchor (gaze-free BC is
    # identical under either gaze variant).
    grilsparse = collect(root, "grilsparse")
    dense = mean_seen(core, "GRIL") if grilsparse else None
    if grilsparse and bc is not None and dense is not None:
        gs, gss, n = stat(grilsparse["GRIL"]["seen"])
        print(f"\nGRIL under sparse gaze: {gs:.1f} ± {gss:.1f} seen ({n} seeds; "
              f"dense-gaze GRIL {dense:.1f}, BC anchor {bc:.1f})")
        ok = 0.6 * bc <= gs <= 1.2 * bc
        print(f"  [{'x' if ok else ' '}] GRIL-sparse within 0.6x..1.2x BC "
              f"(ratio {gs / bc:.2f}; dense ratio {dense / bc:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
