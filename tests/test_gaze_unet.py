"""model.arch=unet: the UNet gaze-predictor backbone trains and round-trips.

The reference ships a 4-level UNet (models/gaze_predictor.py:6-78) that its
default trainers never instantiate; here it is a first-class alternative to
the AutoEncoder via model.arch (VERDICT r3 item 9)."""

import jax
import numpy as np

from gabril_carla_tpu.data import BCDataset, synthetic_episodes
from gabril_carla_tpu.models import UNet
from gabril_carla_tpu.train import Trainer
from gabril_carla_tpu.train.checkpoint import load_manifest
from gabril_carla_tpu.utils.config import default_gaze_config


def _cfg(tmp_path):
    cfg = default_gaze_config()
    cfg["data"].update(img_height=180, img_width=320, frame_stack=2,
                       batch_size=4)
    cfg["model"].update(arch="unet")
    cfg["training"].update(epochs=1, compute_dtype="float32", save_interval=1)
    cfg["scheduler"]["type"] = "none"
    cfg["logging"]["log_dir"] = str(tmp_path)
    return cfg


def test_unet_gaze_predictor_trains_and_manifests(tmp_path):
    store = synthetic_episodes(n_demos=1, steps=10, img_hw=(180, 320),
                               max_points=5)
    tr = Trainer(_cfg(tmp_path), BCDataset(store, frame_stack=2), mode="gaze")
    assert isinstance(tr.model, UNet)
    metrics = tr.train()
    assert np.isfinite(metrics["loss"])

    manifest = load_manifest(tr.logger.ckpt_dir / "params.json")
    assert manifest["arch"] == "unet"
    assert manifest["model_type"] == "gaze_predictor"

    # predictor output contract: [B, H, W, 1] heat over the full image
    obs = np.zeros((2, 180, 320, 2), np.float32)
    out = tr.model.apply({"params": jax.device_get(tr.state.params)}, obs)
    assert out.shape == (2, 180, 320, 1)


def test_unknown_arch_rejected(tmp_path):
    cfg = _cfg(tmp_path)
    cfg["model"]["arch"] = "resnet"
    store = synthetic_episodes(n_demos=1, steps=8, img_hw=(180, 320),
                               max_points=5)
    try:
        Trainer(cfg, BCDataset(store, frame_stack=2), mode="gaze")
    except ValueError as e:
        assert "arch" in str(e)
    else:
        raise AssertionError("expected ValueError for unknown arch")
