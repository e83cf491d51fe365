"""Device-resident training path: in-graph batch gather + whole-epoch scan."""

import numpy as np
import jax
import jax.numpy as jnp

from gabril_carla_tpu.data import BCDataset, synthetic_episodes
from gabril_carla_tpu.train import Trainer
from gabril_carla_tpu.train.device_data import DeviceData
from gabril_carla_tpu.utils import default_bc_config


def cfg_small(device_data):
    cfg = default_bc_config()
    cfg["data"].update(img_height=24, img_width=48, frame_stack=2, batch_size=8)
    cfg["model"].update(embedding_dim=8, num_hiddens=16, num_residual_layers=1,
                        num_residual_hiddens=8, z_dim=16)
    cfg["gaze"].update(method="Reg", max_points=3, mask_sigma=4.0)
    cfg["training"].update(epochs=2, compute_dtype="float32", save_interval=99)
    cfg["training"]["device_data"] = device_data
    cfg["scheduler"]["type"] = "none"
    cfg["logging"]["log_dir"] = "/tmp/test_runs"
    return cfg


def test_device_gather_matches_host_sampler():
    store = synthetic_episodes(n_demos=2, steps=9, img_hw=(24, 48), max_points=3, seed=5)
    ds = BCDataset(store, frame_stack=2, use_native=False)
    dd = DeviceData(store, frame_stack=2, grayscale_store=False)
    idxs = np.asarray([0, 1, 8, 9, 10, 17])
    host = ds.sample(idxs)
    dev = jax.tree.map(np.asarray, dd.gather(jnp.asarray(idxs)))
    np.testing.assert_array_equal(host["obs_seq"], dev["obs_seq"])
    np.testing.assert_array_equal(host["gaze_seq"], dev["gaze_seq"])
    np.testing.assert_array_equal(host["actions"], dev["actions"])


def test_device_mode_trains():
    store = synthetic_episodes(n_demos=2, steps=16, img_hw=(24, 48), max_points=3)
    tr = Trainer(cfg_small(True), BCDataset(store, frame_stack=2), mode="bc")
    assert tr.device_mode
    metrics = tr.train()
    assert np.isfinite(metrics["loss"])


def test_full_state_checkpoint_resume():
    store = synthetic_episodes(n_demos=2, steps=16, img_hw=(24, 48), max_points=3)
    tr = Trainer(cfg_small(False), BCDataset(store, frame_stack=2), mode="bc")
    tr.train()
    tr.save_full_state()
    path = tr.logger.ckpt_dir / "ep_resume"

    tr2 = Trainer(cfg_small(False), BCDataset(store, frame_stack=2), mode="bc")
    tr2.restore_full_state(path)
    assert int(tr2.state.step) == int(tr.state.step)
    a = jax.tree.leaves(tr.state.params)[0]
    b = jax.tree.leaves(tr2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    oa = jax.tree.leaves(tr.state.opt_state)[0]
    ob = jax.tree.leaves(tr2.state.opt_state)[0]
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
