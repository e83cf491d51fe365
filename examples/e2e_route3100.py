"""Minimum end-to-end slice (SURVEY.md §7.5): route 3100, plain BC.

Collect scripted-expert demonstrations in-sim (rendered 320x180 frames +
analytic gaze), train behavior cloning on them, then evaluate the checkpoint
closed-loop in the same world — driving score computed in-graph. The whole
reference loop (CARLA server + human demos + torch training + leaderboard
eval) in one process on one chip.

Usage: python examples/e2e_route3100.py [--gaze_method Reg] [--epochs 30]
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

    from gabril_carla_tpu.data import BCDataset, EpisodeStore
    from gabril_carla_tpu.env import DrivingEnv
    from gabril_carla_tpu.env.criteria import compute_score
    from gabril_carla_tpu.env.expert import expert_action
    from gabril_carla_tpu.env.world import load_benchmark_specs
    from gabril_carla_tpu.eval.rollout import make_rollout_fn
    from gabril_carla_tpu.eval.stats import route_record
    from gabril_carla_tpu.ops.raster import analytic_gaze, render_frame
    from gabril_carla_tpu.train import Trainer
    from gabril_carla_tpu.train.bc import make_bc_policy_fn
    from gabril_carla_tpu.utils import default_bc_config

    p = argparse.ArgumentParser()
    p.add_argument("--route", type=int, default=3100)
    p.add_argument("--train_seeds", type=int, nargs="*", default=list(range(200, 208)))
    p.add_argument("--eval_seeds", type=int, nargs="*", default=[400, 401])
    p.add_argument("--gaze_method", default="None")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--collect_steps", type=int, default=600)
    p.add_argument("--eval_steps", type=int, default=1200)
    p.add_argument("--routes_xml", default=None)
    p.add_argument("--log_dir", default="runs_e2e")
    args = p.parse_args()

    spec = jax.tree.map(lambda a: jnp.asarray(a[0]), load_benchmark_specs(args.routes_xml, [args.route]))
    env = DrivingEnv()

    # ---- 1. collect expert demonstrations (compile once, reuse per seed)
    t0 = time.time()

    @jax.jit
    def collect(key):
        def tick(state, _):
            frame = render_frame(spec, state)
            gaze = analytic_gaze(spec, state)
            action = expert_action(spec, state)
            state = env.step(spec, state, action)
            return state, (frame, action, gaze)

        return jax.lax.scan(tick, env.reset(spec, key), None, length=args.collect_steps)

    store = EpisodeStore()
    for s in args.train_seeds:
        state, (frames, actions, gazes) = collect(jax.random.PRNGKey(s))
        n = int(np.asarray(state.t))
        imgs = (np.asarray(frames[:n])[..., None] * 255).astype(np.uint8).repeat(3, -1)
        store.add(imgs, np.asarray(gazes[:n]), np.asarray(actions[:n]))
        print(f"collected route {args.route} seed {s}: {n} ticks", flush=True)
    print(f"[collect] {sum(len(x) for x in store.images)} frames in {time.time()-t0:.1f}s", flush=True)

    # ---- 2. train BC
    cfg = default_bc_config()
    cfg["data"].update(batch_size=args.batch_size, task=f"Route{args.route}")
    cfg["gaze"]["method"] = args.gaze_method
    cfg["training"].update(epochs=args.epochs, save_interval=args.epochs)
    cfg["logging"]["log_dir"] = args.log_dir
    trainer = Trainer(cfg, BCDataset(store, frame_stack=cfg.data["frame_stack"]), mode="bc")
    t0 = time.time()
    metrics = trainer.train()
    print(f"[train] {args.epochs} epochs in {time.time()-t0:.1f}s: {metrics}")

    # ---- 3. closed-loop eval of the fresh checkpoint
    policy = make_bc_policy_fn(trainer.models, cfg)
    roll = make_rollout_fn(lambda p, o, h=None: policy(p, o, h), cfg, steps=args.eval_steps)
    t0 = time.time()
    records = []
    for s in args.eval_seeds:
        state, _ = jax.jit(roll)(spec, trainer.state.params, jax.random.PRNGKey(s))
        sc = compute_score(spec, state)
        rec = route_record(args.route, s, sc, duration_game=float(state.t) * 0.05,
                           route_length=float(spec.route_len))
        records.append(rec)
        print(f"[eval] seed {s}: score {rec['scores']['score_composed']:.2f} "
              f"route% {rec['scores']['score_route']:.1f} [{rec['status']}]")
    mean = np.mean([r["scores"]["score_composed"] for r in records])
    print(f"[eval] mean driving score: {mean:.2f} ({time.time()-t0:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
