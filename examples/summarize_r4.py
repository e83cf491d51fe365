"""Summarize round-4 suites on top of the round-3 re-anchor.

Adds to examples/summarize_r3.py (whose collect/table machinery it reuses):

  * the gaze-statistics ladder for the two round-3 ordering misses —
    dense analytic (results_r3/core2) -> spatial-only sparse
    (results_r4/sparse_core, one tick-accurate fixation + dropout) ->
    full eye-tracker statistics (results_r4/human_core, fixations HOLD
    between saccades with landing/drift noise). The reference's GRIL band
    and GMD column are judged on the statistics-matched rung;
  * the confounded degradation check at 6 paired seeds with a
    paired-by-seed t-CI (VERDICT r3 item 2);
  * the calibration scorecard (mean |delta| + Spearman vs the published
    VLM tables) recomputed with the statistics-matched gaze cells
    substituted for the gaze-coordinate-consuming methods;
  * ambient-junction-traffic re-anchor deltas (results_r4/jct_anchor vs
    the junction-free core2 cells, VERDICT r3 item 5).

    python examples/summarize_r4.py [results_r3] [results_r4]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from summarize_r3 import collect, stat, table  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples.calibration_scorecard import (METHODS, load_ref,  # noqa: E402
                                            scorecard, spearman)


def mean_seen(data, m):
    return float(np.mean(data[m]["seen"])) if m in data and data[m]["seen"] else None


def collect_by_seed(*roots):
    """{method: {train_seed: seen}} over every report.json under the given
    suite dirs. Paired statistics join on the report's recorded train_seed —
    NOT on sorted-glob list position, which silently misaligns pairs when
    one cell is missing a seed or the dirs carry different seed sets
    (ADVICE r4). Later dirs win on a duplicate (method, seed).

    Per-seed values follow the SAME preferences as summarize_r3.collect, so
    paired statistics agree with the tables printed beside them: a
    report_reeval.json (final-criteria re-score) replaces report.json, and
    report_evalseeds23.json (eval seeds 402/403) is averaged in for the
    methods it covers (one 40-rollout mean per seed)."""
    import json

    out = {}
    for root in roots:
        for rep_path in sorted(Path(root).glob("**/report.json")):
            reeval = rep_path.with_name("report_reeval.json")
            rep = json.loads((reeval if reeval.exists() else rep_path).read_text())
            extra_path = rep_path.with_name("report_evalseeds23.json")
            extra = (json.loads(extra_path.read_text()).get("methods", {})
                     if extra_path.exists() else {})
            seed = rep.get("train_seed")
            if seed is None:
                continue
            for m, d in rep.get("methods", {}).items():
                v = float(d["seen"])
                if m in extra:
                    v = 0.5 * (v + float(extra[m]["seen"]))
                out.setdefault(m, {})[seed] = v
    return out


def paired(by_seed_a, by_seed_b):
    """Join two {seed: value} maps on seed id; returns aligned arrays and
    the shared seed list (sorted)."""
    seeds = sorted(set(by_seed_a) & set(by_seed_b))
    return (np.asarray([by_seed_a[s] for s in seeds]),
            np.asarray([by_seed_b[s] for s in seeds]), seeds)


def main(r3="results_r3", r4="results_r4"):
    r3, r4 = Path(r3), Path(r4)

    # ---- round-3 anchors (same pooling as summarize_r3: core2 + rest +
    # agil_seeds carry the clean cells, conf2 the confounded ones)
    core = collect(r3, "core2")
    for extra in ("rest", "agil_seeds"):
        for m, d in collect(r3, extra).items():
            core[m]["seen"] += d["seen"]
            core[m]["unseen"] += d["unseen"]
    conf = collect(r3, "conf2")

    sparse_core = collect(r4, "sparse_core")
    sparse_conf = collect(r4, "sparse_conf")
    human_core = collect(r4, "human_core")
    jct = collect(r4, "jct_anchor")

    table(sparse_core, "Spatial-only sparse gaze (tick-accurate fixation + dropout)")
    table(sparse_conf, "Spatial-only sparse gaze, CONFOUNDED")
    table(human_core, "Eye-tracker-statistics gaze (hold + landing/drift noise)")
    table(jct, "Ambient junction traffic ON (fresh expert cache)")

    bc = mean_seen(core, "None")

    # ---- the gaze-statistics ladder for the two round-3 ordering misses
    print("\n### Gaze-statistics ladder (seen means; BC anchor "
          f"{bc:.1f} is gaze-free, shared)\n")
    print("| Method | dense analytic | + spatial sparsity | + temporal statistics | ref (VLM) |")
    print("|---|---|---|---|---|")
    for label, m in (("GRIL", "GRIL"), ("GMD", "None:GMD"), ("GABRIL", "Reg@0.3")):
        d0, d1, d2 = mean_seen(core, m), mean_seen(sparse_core, m), mean_seen(human_core, m)
        ref = {"GRIL": 50.1, "GMD": 43.0, "GABRIL": 62.4}[label]
        row = " | ".join("—" if v is None else f"{v:.1f}" for v in (d0, d1, d2))
        print(f"| {label} | {row} | {ref} |")

    checks = []
    gril_h, gmd_h, gab_h = (mean_seen(human_core, m)
                            for m in ("GRIL", "None:GMD", "Reg@0.3"))
    if gril_h is not None and bc is not None:
        checks.append((f"GRIL within 0.6x..1.2x BC under matched statistics "
                       f"(ratio {gril_h / bc:.2f}; Original.csv: 50.1 vs 47.8)",
                       0.6 * bc <= gril_h <= 1.2 * bc))
    if gmd_h is not None and gab_h is not None:
        checks.append((f"GABRIL >= GMD under matched statistics "
                       f"({gab_h:.1f} vs {gmd_h:.1f}; ref 62.4 > 43.0)",
                       gab_h >= gmd_h))

    # ---- confounded degradation at 6 paired seeds with a t-CI,
    # joined on the recorded train_seed (ADVICE r4: list-position pairing
    # silently misaligns when seed sets differ)
    deg_c = collect_by_seed(r3 / "core2", r3 / "rest", r3 / "agil_seeds",
                            r3 / "deg_clean")
    deg_f = collect_by_seed(r3 / "conf2", r3 / "deg_conf")
    pair_seeds = sorted(
        set.intersection(*[set(deg_c.get(m, {})) for m in ("None", "Reg@0.3")],
                         *[set(deg_f.get(m, {})) for m in ("None", "Reg@0.3")]))
    n_pair = len(pair_seeds)
    if n_pair >= 4:
        rel = {}
        for m in ("None", "Reg@0.3"):
            cl = np.asarray([deg_c[m][s] for s in pair_seeds])
            cf = np.asarray([deg_f[m][s] for s in pair_seeds])
            rel[m] = (cl - cf) / np.maximum(cl, 1e-6)
        diff = rel["None"] - rel["Reg@0.3"]  # >0 = BC degrades more
        t5 = {4: 3.182, 5: 2.776, 6: 2.571, 7: 2.447}.get(n_pair, 2.571)
        half = t5 * diff.std(ddof=1) / np.sqrt(n_pair)
        print(f"\n### Relative degradation, {n_pair} paired seeds "
              f"(clean->confounded, seen)\n")
        print("  BC    : " + " ".join(f"{v:+.0%}" for v in rel["None"]))
        print("  GABRIL: " + " ".join(f"{v:+.0%}" for v in rel["Reg@0.3"]))
        print(f"  paired diff (BC - GABRIL): {diff.mean():+.1%} "
              f"± {half:.1%} (95% t-CI), BC degrades more in "
              f"{int((diff > 0).sum())}/{n_pair} pairs")
        # the reference's own effect is 3pp of relative degradation
        # (Confounded.csv: -31% vs -28%); when the CI half-width dwarfs
        # that, the honest verdict is 'below instrument resolution', not a
        # pass or fail read off the point estimate's sign
        if half <= 0.06:
            checks.append((f"BC degrades more than GABRIL at {n_pair} paired "
                           f"seeds ({diff.mean():+.1%} ± {half:.1%}; "
                           "ref effect 3pp)", diff.mean() > 0))
        else:
            print(f"  -> INDETERMINATE: the published effect (3pp relative) is "
                  f"{half / 0.03:.0f}x smaller than the CI half-width at 20-40 "
                  f"rollouts/cell; CI includes both orderings")

    # ---- sparse-gaze ratio tail at 6 seeds (VERDICT r3 weak item 2):
    # r3 saw ratio 1.0 BELOW 0.5 by ~5.6 at 3 seeds where the reference's
    # table3 rises monotonically; chain G extends ratios 0.5/0.75/1.0 to 6
    # seeds on the same expert cache (examples/run_suites_r4g.sh)
    sparse_r3 = collect(r3, "sparse")
    tail = collect(r4, "sparse_tail")
    if tail:
        pooled_ratio = {}
        for m in set(sparse_r3) | set(tail):
            if "%" not in m:
                continue
            pooled_ratio[m] = (sparse_r3.get(m, {"seen": []})["seen"]
                               + tail.get(m, {"seen": []})["seen"])
        print("\n### Sparse-gaze ratio sweep, tail extended to 6 seeds\n")
        for m in sorted(pooled_ratio, key=lambda x: float(x.split("%")[1])):
            mn, sd, n = stat(pooled_ratio[m])
            print(f"  ratio {m.split('%')[1]:>4}: {mn:.1f} ± {sd:.1f} ({n} seeds)")
        ratio_by_seed = collect_by_seed(r3 / "sparse", r4 / "sparse_tail")
        v10, v05, t_seeds = paired(ratio_by_seed.get("Reg@0.3%1.0", {}),
                                   ratio_by_seed.get("Reg@0.3%0.5", {}))
        n_t = len(t_seeds)
        if n_t >= 4:
            d = v10 - v05  # ratio 1.0 minus 0.5, joined on train_seed
            t5 = {4: 3.182, 5: 2.776, 6: 2.571, 7: 2.447}.get(n_t, 2.571)
            half = t5 * d.std(ddof=1) / np.sqrt(n_t)
            print(f"  ratio 1.0 - 0.5, paired by seed: {d.mean():+.1f} "
                  f"± {half:.1f} (95% t-CI, {n_t} seeds)")
            if abs(d.mean()) > half:
                checks.append((f"ratio 1.0 vs 0.5 tail sign at {n_t} seeds "
                               f"({d.mean():+.1f} ± {half:.1f}; table3 rises "
                               "monotonically)", d.mean() >= 0))
            else:
                print("  -> tail dip is INSIDE seed noise at 6 seeds: the "
                      "rising-trend check stands on direction (0 -> 0.5), "
                      "the 0.5 -> 1.0 segment is flat within the CI")

    # ---- junction-traffic re-anchor deltas (VERDICT r3 item 5)
    if jct:
        print("\n### Junction-traffic re-anchor deltas (seen)\n")
        for m in ("None", "Reg@0.3"):
            j, d = mean_seen(jct, m), mean_seen(core, m)
            if j is not None and d is not None:
                n = len(jct[m]["seen"])
                print(f"  {m}: {j:.1f} (jct on, {n} seeds) vs {d:.1f} "
                      f"(core2 pool) -> Δ {j - d:+.1f}")

    # ---- UNet gaze-predictor comparison cell (VERDICT r3 item 9): AGIL
    # with the UNet backbone vs the AutoEncoder AGIL cells pooled in core
    def fmt(v):
        m, sd, n = stat(v)
        return f"{m:.1f} ± {sd:.1f} ({n} seeds)"

    unet = collect(r4, "unet_gp")
    if unet.get("AGIL", {}).get("seen"):
        agil_ae = core.get("AGIL", {"seen": []})
        print("\n### Gaze-predictor backbone: UNet vs AutoEncoder (AGIL)\n")
        print(f"  UNet       : seen {fmt(unet['AGIL']['seen'])}  "
              f"unseen {fmt(unet['AGIL']['unseen'])}")
        if agil_ae["seen"]:
            print(f"  AutoEncoder: seen {fmt(agil_ae['seen'])}  "
                  f"unseen {fmt(agil_ae['unseen'])}")

    # ---- AGIL seed extension (VERDICT r3 weak item 3): defaults are
    # unchanged since the r3 re-anchor, so fresh seeds pool with core
    agil_ext = collect(r4, "agil_ext")
    if agil_ext.get("AGIL", {}).get("seen"):
        pooled = {k: core["AGIL"][k] + agil_ext["AGIL"][k]
                  for k in ("seen", "unseen")}
        bc_seen = core["None"]["seen"]
        n = len(pooled["seen"])
        print(f"\n### AGIL at {n} seeds (core pool + agil_ext)\n")
        print(f"  AGIL seen {fmt(pooled['seen'])}  "
              f"unseen {fmt(pooled['unseen'])}")
        print(f"  BC   seen {fmt(bc_seen)}")
        checks.append((f"AGIL > BC clean at {n} seeds "
                       f"({np.mean(pooled['seen']):.1f} vs "
                       f"{np.mean(bc_seen):.1f}; ref 56.2 vs 47.8)",
                       float(np.mean(pooled["seen"])) > float(np.mean(bc_seen))))

    # ---- flipped-defaults pilot (chain L): junction traffic + eye-tracker
    # gaze + UNet predictor TOGETHER (docs/DEFAULTS_R5.md). A pilot, not an
    # ordering claim — the round-5 re-anchor owns those.
    pilot = collect(r4, "flip_pilot")
    if pilot:
        table(pilot, "Flipped-defaults pilot (junction + eye-tracker gaze + "
                     "UNet predictor, jct cache)")
        ref_pub = {"None": 47.8, "Reg@0.3": 62.4, "AGIL": 56.2, "None:GMD": 43.0}
        print("  vs published VLM seen column:")
        for m, ref in ref_pub.items():
            v = mean_seen(pilot, m)
            if v is not None:
                print(f"    {m:>10}: {v:.1f} (ref {ref})")

    print("\nRound-4 ordering checks:")
    for name, ok in checks:
        print(f"  [{'x' if ok else ' '}] {name}")

    # ---- calibration scorecard: all-dense (round-3 instrument) and the
    # statistics-matched substitution (GRIL + GMD + GABRIL from human_core)
    ours_dense = {m: v for m, v in core.items()}
    scorecard("Clean, all-dense gaze (round-3 instrument)",
              load_ref("Original"), ours_dense)
    if human_core:
        ours_sub = dict(ours_dense)
        for m in ("GRIL", "None:GMD", "Reg@0.3"):
            if human_core.get(m, {}).get("seen"):
                ours_sub[m] = human_core[m]
        scorecard("Clean, statistics-matched gaze substituted "
                  "(GRIL/GMD/GABRIL from human_core)",
                  load_ref("Original"), ours_sub)
    scorecard("Confounded (conf2)", load_ref("Confounded"), conf)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
