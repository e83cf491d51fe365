"""Expert stress harness: per-route collision/score breakdown at many seeds.

Round-3 instrument for hardening the scripted expert (VERDICT item 4): the
demonstrator's collisions poison every method's BC data, so this measures the
expert alone — vmapped over seeds per route — and prints score mean,
collision-rollout fraction, and failure tags.

Usage:
    python examples/expert_stress.py --routes 3099 3100 --seeds 16
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from gabril_carla_tpu.env import DrivingEnv
    from gabril_carla_tpu.env.criteria import compute_score
    from gabril_carla_tpu.env.expert import expert_action
    from gabril_carla_tpu.env.world import load_benchmark_specs

    p = argparse.ArgumentParser()
    p.add_argument("--routes_xml", default=None)
    p.add_argument("--routes", type=int, nargs="+", default=[3099, 3100])
    p.add_argument("--seeds", type=int, default=16)
    p.add_argument("--steps", type=int, default=900)
    p.add_argument("--junction_traffic", action="store_true",
                   help="ambient junction crossing traffic (env/world.py)")
    args = p.parse_args()

    env = DrivingEnv()
    specs = load_benchmark_specs(args.routes_xml, args.routes,
                                 junction_traffic=args.junction_traffic or None)
    specs = jax.tree.map(jnp.asarray, specs)

    @jax.jit
    def roll(spec, key):
        def tick(state, _):
            return env.step(spec, state, expert_action(spec, state)), None

        state, _ = jax.lax.scan(tick, env.reset(spec, key), None, length=args.steps)
        return state

    roll_batch = jax.vmap(roll, in_axes=(None, 0))

    overall = []
    for i, r in enumerate(args.routes):
        spec = jax.tree.map(lambda a: a[i], specs)
        keys = jnp.stack([jax.random.PRNGKey(1000 + s) for s in range(args.seeds)])
        t0 = time.time()
        states = jax.device_get(roll_batch(spec, keys))
        rows = []
        for j in range(args.seeds):
            st = jax.tree.map(lambda a: a[j], states)
            sc = {k: float(np.asarray(v)) for k, v in compute_score(spec, st).items()}
            rows.append(sc)
        score = np.array([x["score_composed"] for x in rows])
        colls = np.array([x["collisions_vehicle"] + x["collisions_pedestrian"]
                          + x["collisions_static"] for x in rows])
        tags = {
            "coll%": 100.0 * (colls > 0).mean(),
            "blocked%": 100.0 * np.mean([x["blocked"] for x in rows]),
            "timeout%": 100.0 * np.mean([x["scenario_timeout"] for x in rows]),
            "dev%": 100.0 * np.mean([x["deviated"] for x in rows]),
            "route%": np.mean([x["score_route"] for x in rows]),
        }
        print(f"route {r}: score {score.mean():6.1f} ± {score.std():4.1f}  "
              + "  ".join(f"{k} {v:5.1f}" for k, v in tags.items())
              + f"  ({time.time()-t0:.0f}s)", flush=True)
        worst = np.argsort(score)[:3]
        for j in worst:
            x = rows[j]
            print(f"   seed {j}: score {x['score_composed']:5.1f} route% {x['score_route']:5.1f} "
                  f"pen {x['score_penalty']:.2f} "
                  f"collV {x['collisions_vehicle']:.0f} collP {x['collisions_pedestrian']:.0f} "
                  f"collS {x['collisions_static']:.0f} red {x['red_light']:.0f} "
                  f"stop {x['stop_infraction']:.0f} lane% {x['outside_route_lanes_pct']:.1f} "
                  f"minspd {x['min_speed_penalty']:.2f} block {x['blocked']:.0f} "
                  f"timeout {x['scenario_timeout']:.0f}", flush=True)
        overall.append(score.mean())
    print(f"mean over routes: {np.mean(overall):.2f}")


if __name__ == "__main__":
    main()
