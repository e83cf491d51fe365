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


def test_sharded_device_mode_trains_and_replicates():
    """8-way sharded device-resident epoch: loss finite + decreasing, params
    stay bitwise replicated across shards (pmean = the DDP allreduce)."""
    from gabril_carla_tpu.parallel import make_mesh

    store = synthetic_episodes(n_demos=10, steps=24, img_hw=(24, 48), max_points=3)
    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    cfg = cfg_small(True)
    cfg["training"]["epochs"] = 3
    tr = Trainer(cfg, BCDataset(store, frame_stack=2), mode="bc", mesh=mesh)
    assert tr.device_mode and tr._sharded_device
    metrics = tr.train()
    assert np.isfinite(metrics["loss"])
    # every shard of every param must hold the same replicated values
    p = jax.tree.leaves(tr.state.params)[0]
    shards = [np.asarray(s.data) for s in p.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)


def test_sharded_gather_covers_all_episodes():
    """Episode partition preserves every frame and keeps windows shard-local."""
    from gabril_carla_tpu.parallel import make_mesh
    from gabril_carla_tpu.train.device_data import ShardedDeviceData

    store = synthetic_episodes(n_demos=5, steps=11, img_hw=(24, 48), max_points=3, seed=3)
    mesh = make_mesh(jax.devices()[:4], data=4, model=1)
    sdd = ShardedDeviceData(store, frame_stack=2, mesh=mesh, grayscale_store=False)
    assert sdd.n_samples == sum(len(x) for x in store.images)
    imgs = np.asarray(sdd.images)
    # every original frame appears in some shard
    total = sum(int(n) for n in sdd.n_local)
    assert total == sdd.n_samples
    # window indices stay inside the valid local range of their shard
    win = np.asarray(sdd.win_idx)
    for d in range(4):
        n = int(sdd.n_local[d])
        assert win[d, :n].max() < n
        # local frames match the original episode content
        flat = np.concatenate([store.images[e] for e in range(5)])
        for row in range(n):
            frame = imgs[d, row]
            assert (flat == frame).all(axis=(1, 2, 3)).any()


def test_full_state_checkpoint_resume(tmp_path):
    """Full-state checkpoint API (save_resume/restore_resume; the bit-for-bit
    continuation property is covered by tests/test_resume.py)."""
    store = synthetic_episodes(n_demos=2, steps=16, img_hw=(24, 48), max_points=3)
    cfg = cfg_small(False)
    cfg["logging"].update(log_dir=str(tmp_path), run_name="fullstate")
    tr = Trainer(cfg, BCDataset(store, frame_stack=2), mode="bc")
    tr.train()
    tr.save_resume(epoch_done=int(cfg["training"]["epochs"]))

    cfg2 = cfg_small(False)
    cfg2["logging"].update(log_dir=str(tmp_path), run_name="fullstate")
    tr2 = Trainer(cfg2, BCDataset(store, frame_stack=2), mode="bc")
    assert tr2.restore_resume() == int(cfg["training"]["epochs"])
    assert int(tr2.state.step) == int(tr.state.step)
    a = jax.tree.leaves(tr.state.params)[0]
    b = jax.tree.leaves(tr2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    oa = jax.tree.leaves(tr.state.opt_state)[0]
    ob = jax.tree.leaves(tr2.state.opt_state)[0]
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
