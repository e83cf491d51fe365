"""Checkpointing: Orbax params snapshots + a params.json manifest.

Supersedes the reference's per-module torch.save + params.json
(train/train_bc.py:301-335): one Orbax tree per epoch holds every module's
params; the manifest carries the model hyperparameters the eval agent needs
to rebuild the network (eval/my_agents/bc_agent.py:44-59).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import orbax.checkpoint as ocp


def save_params(ckpt_dir: str | Path, epoch: int, params) -> Path:
    path = Path(ckpt_dir).absolute() / f"ep{epoch}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(params), force=True)
    return path

def restore_params(path: str | Path, template=None):
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(Path(path).absolute(), template)
        return ckptr.restore(Path(path).absolute())


def save_manifest(ckpt_dir: str | Path, cfg, epoch: int, extra: dict | None = None) -> Path:
    """params.json with the keys bc_agent expects (train_bc.py:318-334)."""
    manifest = {
        "gaze_method": cfg.get_path("gaze.method", "None"),
        "dp_method": cfg.get_path("dropout.method", "None"),
        "grayscale": cfg.model["grayscale"],
        "stack": cfg.data["frame_stack"],
        "embedding_dim": cfg.model["embedding_dim"],
        "num_embeddings": cfg.get_path("dropout.num_embeddings", 512),
        "num_hiddens": cfg.model["num_hiddens"],
        "num_residual_layers": cfg.model["num_residual_layers"],
        "num_residual_hiddens": cfg.model["num_residual_hiddens"],
        "z_dim": cfg.model["z_dim"],
        "gaze_predictor_path": cfg.get_path("gaze.predictor_path", ""),
        "models_path": str(Path(ckpt_dir).absolute()),
        "epochs": epoch,
        "action_dim": cfg.data["action_dim"],
        # training-identity fields: (gaze_method, dp_method) alone is
        # ambiguous inside an ablation suite (lambda/ratio/temporal sweeps
        # share the pair), and reeval.py needs to re-attach labels to
        # checkpoints without trusting directory order
        "gaze_lambda": cfg.get_path("gaze.lambda_weight", None),
        "gaze_ratio": cfg.get_path("gaze.ratio", None),
        "temporal_flag": cfg.get_path("gaze.temporal_flag", True),
    }
    if extra:
        manifest.update(extra)
    out = Path(ckpt_dir) / "params.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(manifest, indent=2))
    return out


def load_manifest(path: str | Path) -> dict:
    return json.loads(Path(path).read_text())
