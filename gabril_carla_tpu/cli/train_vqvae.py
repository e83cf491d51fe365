"""VQ-VAE pretraining CLI (produces the checkpoint Oreo's dropout loads)."""

from __future__ import annotations

import argparse

from ..train import Trainer
from ..utils.config import default_bc_config, load_config
from .train_bc import build_dataset


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    cfg = load_config(args.config, args.overrides, base=default_bc_config().to_dict())
    trainer = Trainer(cfg, build_dataset(cfg), mode="vqvae")
    metrics = trainer.train()
    print("Training completed!", metrics)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
