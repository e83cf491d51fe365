"""BC eval agent: rebuild models + policy from a checkpoint manifest.

Parity with BCAgent's model reconstruction (eval/my_agents/bc_agent.py:44-144:
read params.json, rebuild encoder/heads from recorded hyperparameters, load
weights, optionally load the frozen gaze predictor named by
'gaze_predictor_path'). Orbax trees replace per-module .pth files, so there is
no _orig_mod./module. prefix stripping to do.
"""

from __future__ import annotations

from pathlib import Path

import jax

from ..train.bc import build_bc_models, init_bc_params, make_bc_policy_fn
from ..train.checkpoint import load_manifest, restore_params
from ..train.gaze_predictor import build_gaze_models
from ..utils.config import Config, default_bc_config


def manifest_to_config(manifest: dict) -> Config:
    """params.json -> training-equivalent Config."""
    cfg = default_bc_config()
    cfg["gaze"]["method"] = manifest.get("gaze_method", "None")
    cfg["dropout"]["method"] = manifest.get("dp_method", "None")
    cfg["dropout"]["num_embeddings"] = manifest.get("num_embeddings", 512)
    cfg["model"].update(
        grayscale=manifest.get("grayscale", True),
        embedding_dim=manifest.get("embedding_dim", 64),
        num_hiddens=manifest.get("num_hiddens", 128),
        num_residual_layers=manifest.get("num_residual_layers", 2),
        num_residual_hiddens=manifest.get("num_residual_hiddens", 32),
        z_dim=manifest.get("z_dim", 256),
        arch=manifest.get("arch", "autoencoder"),
    )
    cfg["data"].update(
        frame_stack=manifest.get("stack", 2),
        action_dim=manifest.get("action_dim", 7),
    )
    return cfg


class BCAgent:
    """Loads a trained checkpoint and exposes a jittable policy."""

    def __init__(self, ckpt_dir: str | Path, epoch: int | None = None):
        ckpt_dir = Path(ckpt_dir)
        manifest_path = ckpt_dir / "params.json" if ckpt_dir.is_dir() else ckpt_dir
        self.manifest = load_manifest(manifest_path)
        self.cfg = manifest_to_config(self.manifest)
        ckpt_root = Path(self.manifest.get("models_path", manifest_path.parent))
        epoch = epoch if epoch is not None else self.manifest.get("epochs")
        self.models = build_bc_models(self.cfg)
        template = init_bc_params(self.models, self.cfg, jax.random.PRNGKey(0))
        self.params = restore_params(ckpt_root / f"ep{epoch}", template)
        self.policy = make_bc_policy_fn(self.models, self.cfg)

        # optional frozen gaze predictor (ViSaRL/Mask/AGIL/GMD/IGMD eval path)
        self.gaze_predictor_apply = None
        gp_path = self.manifest.get("gaze_predictor_path", "")
        if gp_path and Path(gp_path).exists():
            gp_manifest = load_manifest(Path(gp_path) / "params.json") if Path(gp_path).is_dir() else {}
            gp_cfg = manifest_to_config({**self.manifest, **gp_manifest})
            gp_cfg["gaze"] = {"sigma": 30.0, "coeff": 0.8, "max_points": 5}
            model, _ = build_gaze_models(gp_cfg)
            gp_epoch = gp_manifest.get("epochs")
            gp_root = Path(gp_manifest.get("models_path", gp_path))
            gp_params = restore_params(gp_root / f"ep{gp_epoch}")
            self.params = dict(self.params)
            self.params["gaze_predictor"] = gp_params
            self.gaze_predictor_apply = lambda p, obs: model.apply({"params": p}, obs)

    def policy_fn(self):
        return lambda params, obs, heat=None: self.policy(params, obs, heat)
