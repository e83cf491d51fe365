"""VQ-VAE pretraining mode + Oreo checkpoint adoption."""

import numpy as np
import jax

from gabril_carla_tpu.data import BCDataset, synthetic_episodes
from gabril_carla_tpu.train import Trainer
from gabril_carla_tpu.utils import default_bc_config


def cfg_small(**over):
    # the decoder's output-padding mirrors the 180x320 geometry exactly
    # (linear_models.py:242-269), so the VQ-VAE round trip needs real dims
    cfg = default_bc_config()
    cfg["data"].update(img_height=180, img_width=320, frame_stack=2, batch_size=4)
    cfg["model"].update(embedding_dim=4, num_hiddens=8, num_residual_layers=1,
                        num_residual_hiddens=4, z_dim=16)
    cfg["gaze"].update(method="None", max_points=3, mask_sigma=4.0)
    cfg["dropout"].update(num_embeddings=16)
    cfg["training"].update(epochs=1, compute_dtype="float32", save_interval=1)
    cfg["scheduler"]["type"] = "none"
    cfg["logging"]["log_dir"] = "/tmp/test_runs"
    for k, v in over.items():
        cfg.set_path(k, v)
    return cfg


def test_vqvae_trains_and_feeds_oreo():
    store = synthetic_episodes(n_demos=1, steps=8, img_hw=(180, 320), max_points=3)
    ds = BCDataset(store, frame_stack=2)

    vtr = Trainer(cfg_small(), ds, mode="vqvae")
    vm = vtr.train()
    assert np.isfinite(vm["loss"]) and "perplexity" in vm
    vtr.save(epoch=1)
    vq_path = str(vtr.logger.ckpt_dir / "ep1")

    # Oreo BC adopts the pretrained encoder + quantizer
    cfg = cfg_small(**{"dropout.method": "Oreo", "dropout.vqvae_path": vq_path,
                       "dropout.oreo_num_mask": 2})
    btr = Trainer(cfg, ds, mode="bc")
    loaded_cb = np.asarray(
        jax.device_get(btr.state.params["quantizer"]["codebook"]))
    trained_cb = np.asarray(jax.device_get(vtr.state.params["quantizer"]["codebook"]))
    np.testing.assert_array_equal(loaded_cb, trained_cb)
    bm = btr.train()
    assert np.isfinite(bm["loss"])
