"""Round-5 summary: the FINAL-SEMANTICS RE-ANCHOR on flipped defaults.

Everything here reads results_r5/ (chains A-D, examples/run_suites_r5*.sh):
junction ambient traffic ON, curvature-anticipating collection gaze,
eye-tracker-statistics gaze for gaze-consuming cells, UNet gaze predictor,
collapse-gated predictor checkpointing, 40 rollouts/cell — one code
version, one fresh expert cache (results_r5/expert_cache_r5.npz).

Sections:
  * headline clean table (11 methods x 3 seeds) + confounded (7 x 3);
  * the round-5 ordering ledger (8 rows) re-judged on this anchor;
  * AGIL > BC at seed depth (anchor seeds 42-44 + agil_depth 45-50,
    paired-by-seed t-CI);
  * the semantic gaze-error rung (misperceive vs the anchor's
    statistics-matched cells, same cache) with the GRIL-ratio criterion;
  * calibration scorecards vs the published HUMAN columns (the
    statistics-matched instrument — round 5's default gaze carries human
    eye-tracker statistics) and the VLM columns (the r3/r4 instrument);
  * the permanent power-analysis verdict for relative confounded
    degradation (VERDICT r4 next-item 2).

    python examples/summarize_r5.py [results_r5]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from summarize_r3 import collect, stat, table  # noqa: E402
from summarize_r4 import collect_by_seed, paired  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples.calibration_scorecard import (METHODS, load_ref,  # noqa: E402
                                            scorecard)

METHOD_LABELS = METHODS  # reference CSV label -> our method spec


def t_ci(diff, conf=0.95):
    """Two-sided t CI half-width for a paired-difference sample."""
    n = len(diff)
    t_tab = {2: 12.71, 3: 4.303, 4: 3.182, 5: 2.776, 6: 2.571, 7: 2.447,
             8: 2.365, 9: 2.306, 10: 2.262, 11: 2.228, 12: 2.201}
    return t_tab.get(n, 2.0) * np.std(diff, ddof=1) / np.sqrt(n)


def main(r5="results_r5"):
    r5 = Path(r5)
    anchor = collect(r5, "anchor")
    conf = collect(r5, "conf")
    depth = collect(r5, "agil_depth")
    mis = collect(r5, "misperceive")

    table(anchor, "ROUND-5 RE-ANCHOR, clean (flipped defaults: junction + "
                  "human-statistics gaze + UNet + curvature fixations; 40 "
                  "rollouts/cell)")
    table(conf, "ROUND-5 RE-ANCHOR, CONFOUNDED (two-pass eval)")

    def ms(data, m, k="seen"):
        return float(np.mean(data[m][k])) if data.get(m, {}).get(k) else None

    checks = []
    bc, gab = ms(anchor, "None"), ms(anchor, "Reg@0.3")
    gril, gmd = ms(anchor, "GRIL"), ms(anchor, "None:GMD")
    agil = ms(anchor, "AGIL")
    bc_c, gab_c = ms(conf, "None"), ms(conf, "Reg@0.3")

    if bc is not None and gab is not None:
        checks.append((f"GABRIL > BC clean ({gab:.1f} vs {bc:.1f}; "
                       "ref 55.2/62.4 vs 47.8)", gab > bc))
    if bc_c is not None and gab_c is not None:
        checks.append((f"GABRIL > BC confounded ({gab_c:.1f} vs {bc_c:.1f}; "
                       "ref 40.7/44.7 vs 32.8)", gab_c > bc_c))
    if gab is not None and agil is not None:
        checks.append((f"GABRIL >= AGIL clean ({gab:.1f} vs {agil:.1f}; "
                       "ref 55.2 vs 53.9)", gab >= agil))
    if gab is not None and gmd is not None:
        checks.append((f"GABRIL >= GMD, statistics-matched gaze "
                       f"({gab:.1f} vs {gmd:.1f}; ref 55.2 > 39.5)", gab >= gmd))
    if gril is not None and bc is not None:
        checks.append((f"GRIL within 0.6x..1.2x BC ({gril / bc:.2f}x; "
                       "ref 50.1 ~= 1.05x 47.8)", 0.6 * bc <= gril <= 1.2 * bc))

    # ---- AGIL > BC at seed depth (anchor + agil_depth), paired by seed
    by_seed = collect_by_seed(r5 / "anchor", r5 / "agil_depth")
    a_v, b_v, seeds = paired(by_seed.get("AGIL", {}), by_seed.get("None", {}))
    if len(seeds) >= 4:
        d = a_v - b_v
        half = t_ci(d)
        print(f"\n### AGIL > BC at {len(seeds)} paired seeds "
              f"(anchor + agil_depth, seeds {seeds})\n")
        print(f"  AGIL {a_v.mean():.1f} ± {a_v.std(ddof=1):.1f}, "
              f"BC {b_v.mean():.1f} ± {b_v.std(ddof=1):.1f}")
        print(f"  paired diff {d.mean():+.1f} ± {half:.1f} (95% t-CI); "
              f"AGIL ahead in {(d > 0).sum()}/{len(seeds)} seeds")
        verdict = (d.mean() - half > 0 and "PASS"
                   or d.mean() + half < 0 and "FAIL" or "INDETERMINATE")
        checks.append((f"AGIL > BC at {len(seeds)} seeds "
                       f"({d.mean():+.1f} ± {half:.1f}; ref 53.9 vs 47.8) "
                       f"-> {verdict}", d.mean() - half > 0))

    # ---- semantic gaze-error rung (ladder rung 4): same cache, same code,
    # only the supervision content differs (wrong-actor + lapses)
    if mis:
        print("\n### Semantic gaze-error rung (misperceive) vs the anchor's "
              "statistics-matched cells (same cache)\n")
        print("| Method | rung 3 (eye-tracker stats) | rung 4 (+ semantic error) | ref (Human) |")
        print("|---|---|---|---|")
        ref_h = load_ref("Original", "Human")
        for label in ("GRIL", "GMD", "GABRIL"):
            spec = METHOD_LABELS[label]
            v3, v4 = ms(anchor, spec), ms(mis, spec)
            r = ref_h[label]["seen"]
            print(f"| {label} | {'—' if v3 is None else f'{v3:.1f}'} | "
                  f"{'—' if v4 is None else f'{v4:.1f}'} | {r:.1f} |")
        g4 = ms(mis, "GRIL")
        if g4 is not None and bc is not None:
            checks.append((f"GRIL ratio-to-BC under SEMANTIC gaze error "
                           f"({g4 / bc:.2f}x; ref 1.05x — the rung-4 "
                           "criterion)", 0.6 * bc <= g4 <= 1.2 * bc))

    # ---- relative confounded degradation: permanent power-analysis verdict
    deg_c = collect_by_seed(r5 / "anchor")
    deg_f = collect_by_seed(r5 / "conf")
    ok = all(m in deg_c and m in deg_f for m in ("None", "Reg@0.3"))
    if ok:
        seeds_d = sorted(set(deg_c["None"]) & set(deg_f["None"])
                         & set(deg_c["Reg@0.3"]) & set(deg_f["Reg@0.3"]))
        if len(seeds_d) >= 3:
            rel = {}
            for m in ("None", "Reg@0.3"):
                cl = np.asarray([deg_c[m][s] for s in seeds_d])
                cf = np.asarray([deg_f[m][s] for s in seeds_d])
                rel[m] = (cl - cf) / np.maximum(cl, 1e-6)
            diff = rel["None"] - rel["Reg@0.3"]
            half = t_ci(diff)
            print(f"\n### Relative confounded degradation, {len(seeds_d)} "
                  "paired seeds (joined on train_seed)\n")
            print("  BC    : " + " ".join(f"{v:+.0%}" for v in rel["None"]))
            print("  GABRIL: " + " ".join(f"{v:+.0%}" for v in rel["Reg@0.3"]))
            print(f"  paired diff (BC − GABRIL): {diff.mean():+.1%} ± {half:.1%}")
            if half > 0.06:
                need = (half / 0.03) ** 2 * len(seeds_d)
                print(f"  -> PERMANENTLY INDETERMINATE at feasible scale: the "
                      f"published effect is 3pp relative; matching it needs the "
                      f"CI half-width below ±3pp, i.e. ~{need:.0f} paired seeds "
                      f"at this per-seed variance (vs {len(seeds_d)} run). The "
                      "scorecard row stays 'indeterminate — below instrument "
                      "resolution' with this power analysis attached.")
                checks.append((f"BC degrades relatively more, confounded "
                               f"({diff.mean():+.1%} ± {half:.1%}; ref 3pp) "
                               "-> PERMANENTLY INDETERMINATE", "~"))
            else:
                verdict = ("pass" if diff.mean() - half > 0
                           else "FAIL" if diff.mean() + half < 0
                           else "INDETERMINATE")
                checks.append((f"BC degrades relatively more, confounded "
                               f"({diff.mean():+.1%} ± {half:.1%}; ref 3pp) "
                               f"-> {verdict}", diff.mean() - half > 0))

    # Row carried from round 4 — no round-5 ratio cells were scheduled: the
    # 6-seed sparse-ratio tail re-judgment (RESULTS.md "Sparse-ratio tail at
    # 6 seeds") stands: trend rises, tail dip inside seed noise.
    checks.append(("sparse-gaze ratio trend rises — carried from round 4 "
                   "(6-seed tail dip −4.3 ± 7.3, inside noise)", True))

    print("\nRound-5 ordering ledger:")
    for name, okc in checks:
        mark = okc if isinstance(okc, str) else ("x" if okc else " ")
        print(f"  [{mark}] {name}")

    # ---- calibration scorecards. Primary: HUMAN columns (round 5's gaze
    # carries human eye-tracker statistics — the matched instrument).
    # Secondary: VLM columns (the r3/r4 instrument, continuity).
    scorecard("Clean vs Original.csv HUMAN columns (matched instrument)",
              load_ref("Original", "Human"), anchor)
    scorecard("Clean vs Original.csv VLM columns (r3/r4 continuity)",
              load_ref("Original", "VLM"), anchor)
    scorecard("Confounded vs Confounded.csv HUMAN columns",
              load_ref("Confounded", "Human"), conf)
    scorecard("Confounded vs Confounded.csv VLM columns",
              load_ref("Confounded", "VLM"), conf)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
