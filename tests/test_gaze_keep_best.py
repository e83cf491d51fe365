"""Gaze-predictor trainer: collapse-GATED restore (round-5 semantics).

Like the reference, the trainer keeps its LAST epoch
(train/common/base_trainer.py:164-180 keeps interval/last checkpoints
only) — unless the run demonstrably collapsed. Regression for the seed-42
collapse (results_r3/core2.log): at batch 128 a clipped-but-hot step can
blow the MSE head into a constant predictor mid-run; every heat-consuming
method (AGIL/ViSaRL/Mask/GMD/IGMD) then evaluates against degenerate heat.
The gate (train/loop.py COLLAPSE_GATE): restore the best-epoch snapshot
only when the final loss exceeds GATE x the best epoch's loss. A normal
run ending within the gate keeps last-epoch params — no silent
best-checkpoint selection on train loss (the round-3/4 divergence this
replaces, docs/PARITY.md).

The divergence is scripted (stubbed epoch function with a fixed loss
sequence and a deterministic param mutation per epoch) so the test pins
exact restore semantics instead of hoping an absurd LR blows up on
schedule.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gabril_carla_tpu.data import BCDataset, synthetic_episodes
from gabril_carla_tpu.train import Trainer
from gabril_carla_tpu.train.checkpoint import restore_params
from gabril_carla_tpu.utils.config import default_gaze_config


def _gaze_cfg(task):
    cfg = default_gaze_config()
    cfg["data"].update(img_height=180, img_width=320, frame_stack=2, batch_size=4,
                       task=task)
    cfg["model"].update(embedding_dim=4, num_hiddens=8, num_residual_layers=1,
                        num_residual_hiddens=4, z_dim=16)
    cfg["training"].update(epochs=4, compute_dtype="float32", save_interval=99)
    cfg["scheduler"]["type"] = "none"
    cfg["logging"]["log_dir"] = "/tmp/test_runs"
    return cfg


def _scripted_trainer(task, losses):
    store = synthetic_episodes(n_demos=1, steps=12, img_hw=(180, 320), max_points=5)
    ds = BCDataset(store, frame_stack=2)
    tr = Trainer(_gaze_cfg(task), ds, mode="gaze")
    it = iter(losses)

    def scripted_epoch(state, perm, sub):
        new = jax.tree.map(lambda x: x * 2.0, state.params)
        return state.replace(params=new), {"loss": jnp.asarray(next(it))}

    if tr.device_mode:
        tr.epoch_fn = scripted_epoch
    else:  # streamed path: same script per step (1 step/epoch at this size)
        tr.step_fn = lambda state, batch, sub: scripted_epoch(state, None, sub)
    return tr


def test_collapse_trips_gate_and_restores_best():
    # best 0.1 at epoch 2, then the MSE head blows up and pins at 0.9
    # (9x best > COLLAPSE_GATE=2x) -> restore the epoch-2 snapshot
    tr = _scripted_trainer("GazeGateCollapse", [0.5, 0.1, 0.9, 0.9])
    p0 = jax.device_get(tr.state.params)
    m = tr.train()
    assert m["kept_best_epoch"] == 2 and abs(m["loss"] - 0.1) < 1e-6, m

    # restored params are the epoch-2 snapshot: p0 * 2^2, not p0 * 2^4
    for a, b in zip(jax.tree.leaves(jax.device_get(tr.state.params)),
                    jax.tree.leaves(p0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b) * 4.0, rtol=1e-6)

    # and the final on-disk checkpoint was re-written with the restored params
    saved = restore_params(tr.logger.ckpt_dir / "ep4")
    for a, b in zip(jax.tree.leaves(jax.device_get(tr.state.params)),
                    jax.tree.leaves(saved)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mild_wobble_keeps_last_epoch():
    # final 0.12 is worse than best 0.1 but within the 2x gate -> keep LAST
    # epoch params (reference last-checkpoint semantics, no best selection)
    tr = _scripted_trainer("GazeGateWobble", [0.5, 0.1, 0.11, 0.12])
    p0 = jax.device_get(tr.state.params)
    m = tr.train()
    assert "kept_best_epoch" not in m, m
    assert abs(m["loss"] - 0.12) < 1e-6, m

    # params are the LAST epoch's: p0 * 2^4
    for a, b in zip(jax.tree.leaves(jax.device_get(tr.state.params)),
                    jax.tree.leaves(p0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b) * 16.0, rtol=1e-6)
