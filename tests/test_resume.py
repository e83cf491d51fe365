"""Preemption-safe full-state training resume (VERDICT r3 item 4).

A killed run must continue bit-for-bit: params + optimizer state + epoch
cursor + both RNG streams round-trip through the resume checkpoint, so the
resumed run's final params equal an uninterrupted run's exactly. The
reference saves module weights only (train/train_bc.py:301-335) and cannot
do this.
"""

import json

import numpy as np
import jax

from gabril_carla_tpu.data import BCDataset, synthetic_episodes
from gabril_carla_tpu.train import Trainer
from gabril_carla_tpu.train.checkpoint import latest_resume_state
from gabril_carla_tpu.utils import default_bc_config
from gabril_carla_tpu.utils.config import default_gaze_config


def cfg_small(tmp_path, run_name, epochs, resume_interval=0):
    cfg = default_bc_config()
    cfg["data"].update(img_height=24, img_width=48, frame_stack=2, batch_size=8)
    cfg["model"].update(embedding_dim=8, num_hiddens=16, num_residual_layers=1,
                        num_residual_hiddens=8, z_dim=16)
    cfg["gaze"].update(method="Reg", max_points=3, mask_sigma=4.0)
    cfg["training"].update(epochs=epochs, compute_dtype="float32",
                           save_interval=99, resume_interval=resume_interval,
                           device_data=False)
    cfg["scheduler"]["type"] = "none"
    cfg["logging"]["log_dir"] = str(tmp_path)
    cfg["logging"]["run_name"] = run_name
    return cfg


def cfg_gaze(tmp_path, run_name, epochs, resume_interval=0):
    cfg = default_gaze_config()
    # gaze predictor needs the real 180x320 encoder/decoder geometry
    cfg["data"].update(img_height=180, img_width=320, frame_stack=2,
                       batch_size=4)
    cfg["model"].update(embedding_dim=4, num_hiddens=8, num_residual_layers=1,
                        num_residual_hiddens=4, z_dim=16)
    cfg["training"].update(epochs=epochs, compute_dtype="float32",
                           save_interval=99, resume_interval=resume_interval,
                           device_data=False)
    cfg["scheduler"]["type"] = "none"
    cfg["logging"]["log_dir"] = str(tmp_path)
    cfg["logging"]["run_name"] = run_name
    return cfg


def _store():
    return synthetic_episodes(n_demos=2, steps=20, img_hw=(24, 48), max_points=3)


def test_resume_reproduces_uninterrupted_run(tmp_path):
    store = _store()

    # uninterrupted 4-epoch run
    tr_a = Trainer(cfg_small(tmp_path, "uninterrupted", epochs=4),
                   BCDataset(store, frame_stack=2), mode="bc")
    tr_a.train()
    ref_params = jax.device_get(tr_a.state.params)

    # same run killed after epoch 2 (simulated: epochs=2 with autosave on)
    cfg_b = cfg_small(tmp_path, "resumable", epochs=2, resume_interval=1)
    tr_b1 = Trainer(cfg_b, BCDataset(store, frame_stack=2), mode="bc")
    tr_b1.train()
    killed_opt = jax.device_get(tr_b1.state.opt_state)

    # resumed with the full epoch budget
    cfg_b2 = cfg_small(tmp_path, "resumable", epochs=4, resume_interval=1)
    tr_b2 = Trainer(cfg_b2, BCDataset(store, frame_stack=2), mode="bc")

    # optimizer state round-trips exactly through the checkpoint
    start = tr_b2.restore_resume()
    assert start == 2
    jax.tree.map(np.testing.assert_array_equal, killed_opt,
                 jax.device_get(tr_b2.state.opt_state))

    tr_b2.train(resume=True)
    jax.tree.map(np.testing.assert_array_equal, ref_params,
                 jax.device_get(tr_b2.state.params))

    # metrics.jsonl is one continuous curve: epochs 1..4 in order
    lines = [json.loads(x) for x in
             (tmp_path / "Mixed_" / "resumable" / "metrics.jsonl")
             .read_text().splitlines()]
    assert [r["epoch"] for r in lines] == [1.0, 2.0, 3.0, 4.0]


def test_incomplete_checkpoint_is_ignored(tmp_path):
    store = _store()
    cfg = cfg_small(tmp_path, "killed", epochs=2, resume_interval=1)
    tr = Trainer(cfg, BCDataset(store, frame_stack=2), mode="bc")
    tr.train()
    ckpt_dir = tr.logger.ckpt_dir
    # a mid-save kill leaves a tree without meta.json — must be skipped
    bogus = ckpt_dir / "_resume_ep9"
    bogus.mkdir()
    (bogus / "tree").mkdir()
    path, meta = latest_resume_state(ckpt_dir)
    assert meta["epoch_done"] == 2

    tr2 = Trainer(cfg_small(tmp_path, "killed", epochs=3, resume_interval=1),
                  BCDataset(store, frame_stack=2), mode="bc")
    assert tr2.restore_resume() == 2


def test_gaze_keep_best_survives_resume(tmp_path):
    store = synthetic_episodes(n_demos=1, steps=10, img_hw=(180, 320),
                               max_points=5)
    cfg = cfg_gaze(tmp_path, "gazerun", epochs=2, resume_interval=1)
    tr = Trainer(cfg, BCDataset(store, frame_stack=2), mode="gaze")
    tr.train()
    assert tr._best_params is not None

    tr2 = Trainer(cfg_gaze(tmp_path, "gazerun", epochs=3, resume_interval=1),
                  BCDataset(store, frame_stack=2), mode="gaze")
    assert tr2.restore_resume() == 2
    assert tr2._best_epoch == tr._best_epoch
    assert tr2._best_loss == tr._best_loss
    jax.tree.map(np.testing.assert_array_equal, tr._best_params,
                 tr2._best_params)
