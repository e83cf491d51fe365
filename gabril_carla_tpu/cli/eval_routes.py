"""Closed-loop route evaluation CLI (env_manager.py + seen/unseen_eval.sh
replacement): one sharded run evaluates every (route, seed) pair and writes
per-route stats.json plus an aggregate — instead of one CARLA server per
route per seed driven by bash loops (vlm_gaze/eval/seen_eval.sh:72-94).

Resume parity with RouteIndexer.validate_and_resume (route_indexer.py:40-93):
existing stats.json entries are skipped unless --no-resume.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from ..data.tasks import TASK_TO_ROUTE
from ..env.criteria import compute_score
from ..env.world import load_benchmark_specs
from ..eval.agent import BCAgent
from ..eval.rollout import make_rollout_fn
from ..eval.stats import aggregate_scores, route_record, write_stats_json

from ..data.vendored import routes_path

DEFAULT_XML = str(routes_path())  # vendored routes220.json.gz, reference XML fallback


def main(argv=None):
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="checkpoint dir containing params.json")
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--routes_xml", default=DEFAULT_XML)
    p.add_argument("--task", default="Mixed_", help="task name or 'Mixed_'")
    p.add_argument("--split", default="test", choices=["train", "test", "test_unseen"])
    p.add_argument("--route_id", type=int, default=None, help="single route override")
    p.add_argument("--xosc", default=None,
                   help="evaluate on an OpenSCENARIO .xosc storyboard (env/xosc.py "
                        "subset) instead of benchmark routes")
    p.add_argument("--junction_traffic", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="ambient junction crossing traffic in the eval worlds; "
                        "DEFAULT ON since round 5 (docs/DEFAULTS_R5.md §1) — "
                        "match it to the checkpoint's training distribution")
    p.add_argument("--seeds", type=int, nargs="*", default=None)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--out", default="eval_out")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--video", action="store_true",
                   help="write an mp4 of each rollout next to its stats.json "
                        "(autonomous_agent.py:118-132 parity)")
    args = p.parse_args(argv)

    xosc_route = None
    if args.xosc is not None:
        from ..env.xosc import load_xosc

        xosc_route = load_xosc(args.xosc)
        pairs = [(xosc_route["id"], s) for s in (args.seeds or [400])]
    elif args.route_id is not None:
        pairs = [(args.route_id, s) for s in (args.seeds or [400])]
    else:
        pairs = TASK_TO_ROUTE[args.task][args.split]
        if args.seeds:
            pairs = [(r, s) for r, _ in pairs for s in args.seeds]

    out = Path(args.out)
    if not args.no_resume:
        pairs = [
            (r, s) for r, s in pairs
            if not (out / f"route_{r}" / f"seed_{s}" / "stats.json").exists()
        ]
    if not pairs:
        print("Nothing to do (all stats present; use --no-resume to rerun)")
        return 0

    agent = BCAgent(args.checkpoint, epoch=args.epoch)
    if xosc_route is not None:
        from ..env.world import build_world_spec

        route_ids = [xosc_route["id"]]
        specs = jax.tree.map(lambda a: jax.numpy.asarray(a)[None],
                             build_world_spec(xosc_route))
    else:
        route_ids = sorted({r for r, _ in pairs})
        specs = jax.tree.map(jax.numpy.asarray,
                             load_benchmark_specs(args.routes_xml, route_ids,
                                                  junction_traffic=args.junction_traffic))
    idx_of = {r: i for i, r in enumerate(route_ids)}

    needs_heat = agent.cfg.gaze["method"] in ("Mask", "ViSaRL", "AGIL") or \
        agent.cfg.dropout["method"] in ("GMD", "IGMD")
    use_analytic = needs_heat and agent.gaze_predictor_apply is None
    if use_analytic:
        print("warning: heat-needing method without a trained gaze predictor in "
              "the manifest — falling back to analytic scene-graph gaze")
    roll = make_rollout_fn(
        agent.policy_fn(), agent.cfg, steps=args.steps,
        gaze_predictor_apply=agent.gaze_predictor_apply,
        use_analytic_gaze=use_analytic,
        return_frames=args.video,
    )
    roll_batch = jax.jit(jax.vmap(roll, in_axes=(0, None, 0)))

    spec_idx = np.asarray([idx_of[r] for r, _ in pairs])
    batch_specs = jax.tree.map(lambda a: a[spec_idx], specs)
    keys = jax.numpy.stack([jax.random.PRNGKey(s * 100003 + r) for r, s in pairs])
    t0 = time.time()
    states, trace = roll_batch(batch_specs, agent.params, keys)
    states = jax.device_get(states)
    wall = time.time() - t0

    records = []
    for i, (r, s) in enumerate(pairs):
        one_spec = jax.tree.map(lambda a: a[idx_of[r]], specs)
        one_state = jax.tree.map(lambda a: a[i], states)
        score = compute_score(one_spec, one_state)
        rec = route_record(
            r, s, score,
            duration_game=float(one_state.t) * 0.05,
            duration_system=wall / len(pairs),
            duration_system_mode="batch_amortized",
            route_length=float(one_spec.route_len),
        )
        write_stats_json(out, rec)
        records.append(rec)
        if args.video:
            from ..eval.video import write_mp4

            n = int(one_state.t)
            frames = np.asarray(jax.device_get(trace[i]))[: max(n, 1)]
            write_mp4(frames, out / f"route_{r}" / f"seed_{s}" / "rollout.mp4")
        print(f"route {r} seed {s}: score {rec['scores']['score_composed']:.2f} [{rec['status']}]")

    agg = aggregate_scores(records)
    (out / "aggregate.json").write_text(json.dumps(agg, indent=2))
    print(f"mean driving score: {agg['mean']:.2f} ± {agg['std']:.2f} over {agg['n']} runs "
          f"({wall:.1f}s wall for {len(pairs)} routes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
