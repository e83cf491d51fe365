"""Interactive human driving + data collection (HumanAgent surface).

    python -m gabril_carla_tpu.cli.drive --route 3100 --seed 200 --gaze mouse
"""

from __future__ import annotations

import argparse


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..env.world import load_benchmark_specs
    from ..eval.human import HumanLoop
    from .eval_routes import DEFAULT_XML

    p = argparse.ArgumentParser()
    p.add_argument("--route", type=int, required=True)
    p.add_argument("--seed", type=int, default=200)
    p.add_argument("--routes_xml", default=DEFAULT_XML)
    p.add_argument("--gaze", default="mouse", choices=["mouse", "center", "dummy", "gazepoint"])
    p.add_argument("--out", default="dataset/bench2drive_tpu_human")
    p.add_argument("--display_scale", type=int, default=3)
    p.add_argument("--controller", default="keyboard", choices=["keyboard", "joystick"],
                   help="driving input device (human_agent.py:120 parity)")
    args = p.parse_args(argv)

    specs = load_benchmark_specs(args.routes_xml, [args.route])
    spec = jax.tree.map(lambda a: jnp.asarray(a[0]), specs)
    HumanLoop(spec, args.out, gaze=args.gaze, display_scale=args.display_scale,
              controller=args.controller).run(args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
