"""Re-evaluate saved benchmark checkpoints under the CURRENT env/criteria.

The round-3 suites train for hours; code improvements that land mid-suite
(e.g. the two-detector OutsideRouteLanesTest) would otherwise leave earlier
suites scored under older semantics than later ones. This tool replays the
EVAL half of examples/full_benchmark.py from the persisted checkpoints —
same routes, same eval seeds, same PRNG scheme — so every suite's numbers
can be re-anchored to one code version without retraining.

    python examples/reeval.py --suite_dir results_r3/core [--confounded]

Writes report_reeval.json next to each seed dir's report.json.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def parse_spec(label: str) -> dict:
    """Method[:Dropout][@lambda][%ratio][!notemporal] -> attr dict
    (full_benchmark.py run_seed grammar)."""
    m, lam, d, ratio, temporal = label, None, "None", None, True
    if "!notemporal" in m:
        m, temporal = m.replace("!notemporal", ""), False
    if "%" in m:
        m, ratio = m.split("%")
        ratio = float(ratio)
    if "@" in m:
        m, lam = m.split("@")
        lam = float(lam)
    if ":" in m:
        m, d = m.split(":")
    return {"gaze_method": m or "None", "dp_method": d or "None",
            "gaze_lambda": lam, "gaze_ratio": ratio,
            "temporal_flag": temporal}


def spec_matches(label: str, man: dict) -> bool:
    """Does a method-spec label describe this checkpoint manifest?

    (gaze_method, dp_method) must agree; the identity fields written by
    save_manifest since round 3 (gaze_lambda/gaze_ratio/temporal_flag)
    must agree when BOTH the label pins a value and the manifest recorded
    one — legacy manifests without them match on the pair alone."""
    p = parse_spec(label)
    if (p["gaze_method"], p["dp_method"]) != (
            man.get("gaze_method", "None"), man.get("dp_method", "None")):
        return False
    for key in ("gaze_lambda", "gaze_ratio"):
        if key in man and man[key] is not None and p[key] is not None \
                and abs(man[key] - p[key]) > 1e-9:
            return False
    # temporal is always pinned by the grammar (absence means True)
    if "temporal_flag" in man and bool(man["temporal_flag"]) != p["temporal_flag"]:
        return False
    return True


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gabril_carla_tpu.env.criteria import compute_score
    from gabril_carla_tpu.env.world import load_benchmark_specs
    from gabril_carla_tpu.eval.agent import BCAgent
    from gabril_carla_tpu.eval.rollout import make_rollout_fn
    from gabril_carla_tpu.eval.stats import aggregate_scores, route_record
    from gabril_carla_tpu.train.checkpoint import restore_params
    from gabril_carla_tpu.train.gaze_predictor import build_gaze_models
    from gabril_carla_tpu.utils.config import default_gaze_config

    from gabril_carla_tpu.data import seen_routes, unseen_routes

    p = argparse.ArgumentParser()
    p.add_argument("--suite_dir", required=True, nargs="+",
                   help="suite roots holding seed*/ dirs (or themselves seed dirs); "
                        "evaluating several suites in one process reuses compiled "
                        "rollouts across same-architecture checkpoints")
    p.add_argument("--routes_xml", default=None)
    p.add_argument("--junction_traffic", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="ambient junction crossing traffic in the re-eval "
                        "worlds; DEFAULT ON since round 5 — MUST match the "
                        "checkpoints' training distribution (pass "
                        "--no-junction_traffic when re-scoring r3/r4 "
                        "junction-free suites, or the re-eval scores that "
                        "summaries prefer over report.json are mismatched)")
    p.add_argument("--eval_seeds", type=int, nargs="*", default=[400, 401])
    p.add_argument("--eval_steps", type=int, default=1600)
    p.add_argument("--methods", nargs="*", default=None,
                   help="method-spec labels in suite order; used to label runs whose "
                        "(gaze, dropout) manifest pair is ambiguous (e.g. a lambda sweep)")
    p.add_argument("--confounded", action="store_true",
                   help="force the two-pass overlay eval; by default each seed dir "
                        "inherits the 'confounded' flag saved in its report.json")
    p.add_argument("--oracle_heat", action="store_true",
                   help="drop the frozen gaze predictor and feed heat-needing methods the "
                        "analytic scene-graph heat directly — isolates predictor quality "
                        "from the method itself (AGIL>BC diagnostic)")
    p.add_argument("--out_name", default="report_reeval.json",
                   help="report filename written next to each seed's report.json "
                        "(use a distinct name for diagnostics like --oracle_heat)")
    p.add_argument("--only", nargs="*", default=None,
                   help="restrict to checkpoints whose resolved label is in this list")
    args = p.parse_args()

    seed_dirs = []
    for root in map(Path, args.suite_dir):
        seed_dirs += sorted(d for d in root.glob("seed*") if d.is_dir()) or [root]

    seen, unseen = seen_routes(), unseen_routes()
    all_specs = jax.tree.map(jnp.asarray, load_benchmark_specs(
        args.routes_xml, seen + unseen, junction_traffic=args.junction_traffic))
    idx_of = {r: i for i, r in enumerate(seen + unseen)}

    # Checkpoints sharing (architecture config, confounded, predictor
    # presence) trace to the same jaxpr; reusing the jitted rollout keyed on
    # that signature turns ~90 tunnel compiles into ~10 for a full re-anchor.
    roll_cache: dict = {}

    for seed_dir in seed_dirs:
        run_dirs = sorted((seed_dir / "runs" / "Mixed_").glob("*/checkpoints"))
        if not run_dirs:
            print(f"[{seed_dir.name}] no Mixed_ checkpoints, skipping")
            continue

        gp_apply, gp_params = None, None
        gp_ckpts = [] if args.oracle_heat else sorted(
            (seed_dir / "runs" / "GazePred").glob("*/checkpoints"))
        if gp_ckpts:
            eps = sorted(gp_ckpts[-1].glob("ep*"), key=lambda d: int(d.name[2:]))
            model, _ = build_gaze_models(default_gaze_config())
            gp_params = restore_params(eps[-1])
            gp_apply = lambda p_, obs: model.apply({"params": p_}, obs)

        report_path = seed_dir / "report.json"
        old = json.loads(report_path.read_text()) if report_path.exists() else {}
        labels = args.methods or list(old.get("methods", {}))
        confounded = args.confounded or bool(old.get("confounded", False))
        # merge into an existing out_name report so staged runs (e.g.
        # --only None Reg@0.3 now, --only GRIL later) accumulate methods
        prev_path = seed_dir / args.out_name
        prev = json.loads(prev_path.read_text()) if prev_path.exists() else {}
        report = {**{k: v for k, v in old.items() if k != "methods"},
                  "reeval": True, "confounded": confounded,
                  "methods": dict(prev.get("methods", {}))}

        for k, ckpt in enumerate(run_dirs):
            agent = BCAgent(ckpt)
            man = agent.manifest
            pair = (man.get("gaze_method", "None"), man.get("dp_method", "None"))
            matches = [m for m in labels if spec_matches(m, man)]
            if len(matches) == 1:
                label = matches[0]
            else:
                # legacy manifests without identity fields: fall back to
                # creation order (run dirs are timestamped, full_benchmark
                # trains methods in report.json insertion order) — unsafe
                # if a suite retry re-trained a subset, hence the warning
                label = labels[k] if k < len(labels) else f"{pair[0]}:{pair[1]}#{k}"
                print(f"[{seed_dir.name}] WARNING: checkpoint {ckpt.parent.name} "
                      f"matches {len(matches)} labels; positional fallback -> "
                      f"'{label}'", flush=True)
            if args.only is not None and label not in args.only:
                continue

            sig = (json.dumps(agent.cfg, sort_keys=True, default=str),
                   confounded, gp_apply is not None, args.eval_steps)
            if sig not in roll_cache:
                roll = make_rollout_fn(agent.policy_fn(), agent.cfg, steps=args.eval_steps,
                                       use_analytic_gaze=True, gaze_predictor_apply=gp_apply,
                                       confounded=confounded)
                roll_cache[sig] = jax.jit(jax.vmap(roll, in_axes=(0, None, 0)))
            roll_v = roll_cache[sig]
            eval_params = dict(agent.params)
            if gp_params is not None:
                eval_params["gaze_predictor"] = gp_params

            results = {}
            for split, routes in (("seen", seen), ("unseen", unseen)):
                pairs = [(r, s) for r in routes for s in args.eval_seeds]
                sel = np.asarray([idx_of[r] for r, _ in pairs])
                specs_b = jax.tree.map(lambda a: a[sel], all_specs)
                keys = jnp.stack([jax.random.PRNGKey(s * 100003 + r) for r, s in pairs])
                t0 = time.time()
                states, _ = roll_v(specs_b, eval_params, keys)
                states = jax.device_get(states)
                recs = []
                for i, (r, s) in enumerate(pairs):
                    spec_i = jax.tree.map(lambda a: a[idx_of[r]], all_specs)
                    st_i = jax.tree.map(lambda a: a[i], states)
                    sc = compute_score(spec_i, st_i)
                    recs.append(route_record(r, s, sc, duration_game=float(st_i.t) * 0.05,
                                             route_length=float(spec_i.route_len)))
                agg = aggregate_scores(recs)
                results[split] = agg["mean"]
                results[f"per_route_{split}"] = {
                    rec["route_id"]: rec["scores"]["score_composed"] for rec in recs}
                print(f"[{seed_dir.name}:{label}:{split}] mean {agg['mean']:.2f} "
                      f"± {agg['std']:.2f} ({time.time()-t0:.0f}s)", flush=True)
            report["methods"][label] = results
            (seed_dir / args.out_name).write_text(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    raise SystemExit(main())
