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


def save_resume_state(ckpt_dir: str | Path, epoch_done: int, tree, meta: dict) -> Path:
    """Preemption-safe full-state checkpoint after ``epoch_done`` epochs.

    Layout: ``<ckpt_dir>/_resume_ep<N>/`` holds the Orbax tree (params,
    optimizer state, jax step keys); ``meta.json`` inside it carries the host
    cursors (epoch, global step, numpy bit-generator state, keep-best
    trackers). The meta file is written atomically AFTER the tree, so a
    checkpoint without meta.json is garbage from a mid-save kill and is
    ignored on restore. Older ``_resume_ep*`` dirs are pruned only after the
    new one is complete — a kill at any instant leaves at least one valid
    checkpoint. Supersedes the reference's weights-only per-epoch saves
    (train/train_bc.py:301-335; SURVEY §5.4 'no optimizer-state resume')."""
    import shutil

    root = Path(ckpt_dir).absolute()
    path = root / f"_resume_ep{epoch_done}"
    if path.exists():
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "tree", jax.device_get(tree), force=True)
    tmp = path / "meta.json.tmp"
    tmp.write_text(json.dumps({"epoch_done": epoch_done, **meta}))
    tmp.rename(path / "meta.json")
    for other in root.glob("_resume_ep*"):
        if other != path:
            shutil.rmtree(other, ignore_errors=True)
    return path


def latest_resume_state(ckpt_dir: str | Path):
    """Return (tree_path, meta) of the newest COMPLETE resume checkpoint,
    or None. Completeness = meta.json present (see save_resume_state)."""
    root = Path(ckpt_dir)
    best = None
    for path in root.glob("_resume_ep*"):
        meta_path = path / "meta.json"
        if not meta_path.exists():
            continue
        meta = json.loads(meta_path.read_text())
        if best is None or meta["epoch_done"] > best[1]["epoch_done"]:
            best = (path / "tree", meta)
    return best


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
        "arch": cfg.get_path("model.arch", "autoencoder"),
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
