"""BC training CLI (vlm_gaze/train/train_bc.py surface, Hydra -> dotted overrides)."""

from __future__ import annotations

import argparse

from ..data import BCDataset, synthetic_episodes
from ..data.dataset import load_hdf5
from ..parallel import maybe_init_distributed
from ..train import Trainer
from ..utils.config import default_bc_config, load_config


def build_dataset(cfg):
    path = cfg.data.get("hdf5_path", "")
    if path:
        store = load_hdf5(path, gaze_key=cfg.data.get("gaze_key", "gaze_coords"),
                          demo_limit=cfg.data.get("num_episodes"))
    else:
        # synthetic fallback so the pipeline is runnable anywhere
        store = synthetic_episodes(n_demos=4, steps=64,
                                   img_hw=(cfg.data["img_height"], cfg.data["img_width"]),
                                   max_points=cfg.gaze.get("max_points", 5),
                                   action_dim=cfg.data["action_dim"])
    return BCDataset(store, frame_stack=cfg.data["frame_stack"])


def main(argv=None, mode: str = "bc"):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--resume", default=None, metavar="RUN_DIR",
                   help="existing run directory (runs/<task>/<run_name>) to "
                        "continue: restores params + optimizer + epoch/RNG "
                        "cursors from its newest full-state checkpoint and "
                        "appends to its metrics.jsonl; also turns on "
                        "per-epoch full-state autosave for THIS run")
    p.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = p.parse_args(argv)
    # multi-host: one jax.distributed.initialize per host before backend use
    # (the torchrun/NCCL-process-group analogue; no-op on single hosts)
    maybe_init_distributed()
    base = default_bc_config().to_dict()
    cfg = load_config(args.config, args.overrides, base=base)
    if args.resume:
        from pathlib import Path

        run_dir = Path(args.resume)
        if not run_dir.is_dir():
            raise SystemExit(f"--resume: no such run directory: {run_dir}")
        # pin the logger into the existing run: <log_dir>/<task>/<run_name>
        cfg["logging"]["run_name"] = run_dir.name
        cfg["data"]["task"] = run_dir.parent.name
        cfg["logging"]["log_dir"] = str(run_dir.parent.parent)
    ds = build_dataset(cfg)
    trainer = Trainer(cfg, ds, mode=mode)
    metrics = trainer.train(resume=bool(args.resume))
    print("Training completed!", metrics)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
