"""Gaze-predictor training CLI (vlm_gaze/train/train_gaze_predictor.py surface)."""

from __future__ import annotations

import argparse

from ..train import Trainer
from ..utils.config import default_gaze_config, load_config
from .train_bc import build_dataset


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    cfg = load_config(args.config, args.overrides, base=default_gaze_config().to_dict())
    ds = build_dataset(cfg)
    trainer = Trainer(cfg, ds, mode="gaze")
    metrics = trainer.train()
    print("Training completed!", metrics)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
