"""Data collection CLI: scripted-expert episodes in the dataset layout.

Replaces the HumanAgent collection flow (eval/my_agents/human_agent.py:
pygame wheel/keyboard + Gazepoint eye tracker -> observations.pt/actions.pt/
gaze.pt under dataset/<name>/route_<id>/seed_<seed>/) with in-graph expert
rollouts: rendered observations, expert actions, and analytic gaze from the
scene graph (the VLM pseudo-gaze replacement). Replay mode re-executes a
recorded action log (human_agent.py:146-148 parity).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..env import DrivingEnv
    from ..env.criteria import compute_score
    from ..env.expert import expert_action
    from ..env.world import load_benchmark_specs, build_world_spec
    from ..eval.stats import route_record, write_stats_json
    from ..ops.raster import analytic_gaze, render_frame
    from .eval_routes import DEFAULT_XML

    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--route", type=int, help="bench2drive220 route id")
    src.add_argument("--xosc", help="OpenSCENARIO .xosc file (env/xosc.py subset)")
    p.add_argument("--seeds", type=int, nargs="+", default=[200])
    p.add_argument("--routes_xml", default=DEFAULT_XML)
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--out", default="dataset/bench2drive_tpu")
    p.add_argument("--replay", default=None, help="episode dir: re-execute its actions.npz")
    p.add_argument("--video", action="store_true",
                   help="also write episode.gif (AutonomousAgent's moviepy export parity)")
    p.add_argument("--curvature_gaze", action="store_true",
                   help="curvature-anticipating (tangent-point) road fixations "
                        "instead of the fixed 15 m preview (ops/raster.py)")
    args = p.parse_args(argv)

    if args.xosc:
        from ..env.xosc import load_xosc

        route_dict = load_xosc(args.xosc)
        spec = jax.tree.map(jnp.asarray, build_world_spec(route_dict))
        route_label = route_dict["name"]
    else:
        specs = load_benchmark_specs(args.routes_xml, [args.route])
        spec = jax.tree.map(lambda a: jnp.asarray(a[0]), specs)
        route_label = args.route
    env = DrivingEnv()

    replay_actions = None
    if args.replay:
        replay_actions = jnp.asarray(np.load(Path(args.replay) / "actions.npz")["actions"])

    def tick(carry, t):
        state = carry
        frame = render_frame(spec, state)
        gaze = analytic_gaze(spec, state,
                             curvature_anticipation=args.curvature_gaze)
        if replay_actions is not None:
            action = replay_actions[jnp.minimum(t, replay_actions.shape[0] - 1)]
        else:
            action = expert_action(spec, state)
        state = env.step(spec, state, action)
        return state, (frame, action, gaze)

    roll = jax.jit(lambda key: jax.lax.scan(tick, env.reset(spec, key), jnp.arange(args.steps)))

    for seed in args.seeds:
        state, (frames, actions, gazes) = roll(jax.random.PRNGKey(seed))
        n = int(np.asarray(state.t))  # valid ticks (world freezes at done)
        ep = Path(args.out) / f"route_{route_label}" / f"seed_{seed}"
        ep.mkdir(parents=True, exist_ok=True)
        obs = (np.asarray(frames[:n]) * 255).astype(np.uint8)[..., None].repeat(3, -1)
        np.savez_compressed(ep / "observations.npz", observations=obs)
        np.savez_compressed(ep / "actions.npz", actions=np.asarray(actions[:n]))
        np.savez_compressed(ep / "gaze.npz", gaze=np.asarray(gazes[:n]))
        if args.video:
            from PIL import Image

            pil = [Image.fromarray(f) for f in obs[:, :, :, 0]]
            pil[0].save(ep / "episode.gif", save_all=True, append_images=pil[1:],
                        duration=50, loop=0)
        score = compute_score(spec, state)
        rec = route_record(route_label, seed, score, duration_game=n * 0.05,
                           route_length=float(spec.route_len))
        write_stats_json(args.out, rec)
        print(f"route {route_label} seed {seed}: {n} ticks, "
              f"score {rec['scores']['score_composed']:.2f} [{rec['status']}] -> {ep}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
