"""One jitted train step per gaze/dropout method: runs, finite, updates params.

Small spatial dims keep CPU compiles fast; the encoder tower is geometry-
agnostic (the 180x320->20x38 contract is covered in test_models.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gabril_carla_tpu.data import BCDataset, synthetic_episodes
from gabril_carla_tpu.train import init_bc_state, make_bc_train_step
from gabril_carla_tpu.train.bc import bc_loss_fn
from gabril_carla_tpu.train.optim import build_optimizer
from gabril_carla_tpu.utils import default_bc_config

H, W, P, A, S = 24, 48, 3, 7, 2


def small_cfg(gaze_method="None", dp_method="None", **over):
    cfg = default_bc_config()
    cfg["data"].update(img_height=H, img_width=W, frame_stack=S, action_dim=A, batch_size=4)
    cfg["model"].update(embedding_dim=8, num_hiddens=16, num_residual_layers=1,
                        num_residual_hiddens=8, z_dim=16)
    cfg["gaze"].update(method=gaze_method, max_points=P, mask_sigma=4.0)
    cfg["dropout"].update(method=dp_method, num_embeddings=16, oreo_num_mask=2)
    cfg["training"].update(compute_dtype="float32", epochs=1)
    cfg["scheduler"]["type"] = "none"  # cosine_warmup has lr=0 at step 0
    for k, v in over.items():
        cfg.set_path(k, v)
    return cfg


def one_batch(cfg):
    store = synthetic_episodes(n_demos=1, steps=8, img_hw=(H, W), max_points=P, action_dim=A)
    ds = BCDataset(store, frame_stack=cfg.data["frame_stack"])
    return next(ds.iter_batches(4, np.random.default_rng(0)))


def run_one_step(cfg):
    tx = build_optimizer(cfg.optimizer, cfg.scheduler, cfg.training, steps_per_epoch=2)
    models, state = init_bc_state(cfg, jax.random.PRNGKey(0), tx)
    step = make_bc_train_step(models, cfg, donate=False)
    batch = jax.tree.map(jnp.asarray, one_batch(cfg))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss for {cfg.gaze['method']}/{cfg.dropout['method']}"
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params["encoder"],
                        new_state.params["encoder"])
    assert max(jax.tree.leaves(diff)) > 0, "encoder params did not update"
    return metrics


@pytest.mark.parametrize("method", ["None", "Reg", "Teacher", "Mask", "ViSaRL", "AGIL", "GRIL", "Contrastive"])
def test_gaze_methods_train(method):
    run_one_step(small_cfg(gaze_method=method))


@pytest.mark.parametrize("dp", ["GMD", "IGMD", "Oreo"])
def test_dropout_methods_train(dp):
    run_one_step(small_cfg(dp_method=dp))


@pytest.mark.parametrize("dist", ["TV", "KL", "JS"])
def test_gabril_prob_dist_types(dist):
    run_one_step(small_cfg(gaze_method="Reg", **{"gaze.prob_dist_type": dist}))


def test_zero_gaze_ratio_disables_reg():
    cfg = small_cfg(gaze_method="Reg", **{"gaze.ratio": 0.0})
    tx = build_optimizer(cfg.optimizer, cfg.scheduler, cfg.training, steps_per_epoch=2)
    models, state = init_bc_state(cfg, jax.random.PRNGKey(0), tx)
    batch = jax.tree.map(jnp.asarray, one_batch(cfg))
    _, metrics = bc_loss_fn(state.params, models, cfg, batch, jax.random.PRNGKey(1))
    assert float(metrics["loss_reg"]) == 0.0


def test_partial_gaze_ratio_is_content_hash():
    cfg = small_cfg(gaze_method="Reg", **{"gaze.ratio": 0.5})
    tx = build_optimizer(cfg.optimizer, cfg.scheduler, cfg.training, steps_per_epoch=2)
    models, state = init_bc_state(cfg, jax.random.PRNGKey(0), tx)
    batch = jax.tree.map(jnp.asarray, one_batch(cfg))
    _, m1 = bc_loss_fn(state.params, models, cfg, batch, jax.random.PRNGKey(1))
    # permuting the batch must not change which samples use gaze
    perm = [2, 0, 3, 1]
    batch2 = jax.tree.map(lambda x: x[jnp.asarray(perm)], batch)
    _, m2 = bc_loss_fn(state.params, models, cfg, batch2, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss_reg"]), float(m2["loss_reg"]), rtol=1e-5)


def test_oreo_replicates_batch():
    cfg = small_cfg(dp_method="Oreo")
    metrics = run_one_step(cfg)
    assert np.isfinite(float(metrics["loss_actor"]))


def test_gril_masks_invalid_padding():
    """-1 padded gaze slots must not enter the coordinate MSE (round-2 fix)."""
    cfg = small_cfg(gaze_method="GRIL")
    tx = build_optimizer(cfg.optimizer, cfg.scheduler, cfg.training, steps_per_epoch=2)
    models, state = init_bc_state(cfg, jax.random.PRNGKey(0), tx)
    batch = jax.tree.map(jnp.asarray, one_batch(cfg))
    # all points valid at a fixed coordinate
    gz = jnp.full_like(batch["gaze_seq"], 0.5)
    b1 = dict(batch, gaze_seq=gz)
    _, m1 = bc_loss_fn(state.params, models, cfg, b1, jax.random.PRNGKey(1))
    # same coords but last 2 points padded -1: masked loss must equal the
    # all-valid loss (identical per-valid-coordinate error), not blow up
    gz2 = gz.at[..., 2:].set(-1.0)
    b2 = dict(batch, gaze_seq=gz2)
    _, m2 = bc_loss_fn(state.params, models, cfg, b2, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss_reg"]))
    # per-coord MSE on the shared first point is identical across both
    np.testing.assert_allclose(float(m1["loss_reg"]), float(m2["loss_reg"]), atol=0.6)
    # all-padding batch contributes zero reg loss
    b3 = dict(batch, gaze_seq=jnp.full_like(gz, -1.0))
    _, m3 = bc_loss_fn(state.params, models, cfg, b3, jax.random.PRNGKey(1))
    assert float(m3["loss_reg"]) == 0.0


def test_contrastive_blank_gaze_gated_out():
    """Tracker-dropout frames (gaze blanked to -1 -> zero heatmap) must not
    enter the contrastive hinge: with gg == 0 the negative equals the input
    exactly (t2 == 0), the margin is unsatisfiable, and the round-5 anchor
    collapsed the encoder at every seed (seen 13.5, loss_reg pinned)."""
    cfg = small_cfg(gaze_method="Contrastive")
    tx = build_optimizer(cfg.optimizer, cfg.scheduler, cfg.training, steps_per_epoch=2)
    models, state = init_bc_state(cfg, jax.random.PRNGKey(0), tx)
    batch = jax.tree.map(jnp.asarray, one_batch(cfg))

    # all samples blank -> zero contrastive reg (previously == threshold + t1)
    b_blank = dict(batch, gaze_seq=jnp.full_like(batch["gaze_seq"], -1.0))
    _, m_blank = bc_loss_fn(state.params, models, cfg, b_blank, jax.random.PRNGKey(1))
    assert float(m_blank["loss_reg"]) == 0.0

    # identical valid samples, half blanked: the weighted mean over the
    # valid half must equal the all-valid batch's reg loss
    tile = jax.tree.map(lambda x: jnp.tile(x[:1], (4,) + (1,) * (x.ndim - 1)), batch)
    gz_valid = jnp.full_like(tile["gaze_seq"], 0.5)
    b_all = dict(tile, gaze_seq=gz_valid)
    _, m_all = bc_loss_fn(state.params, models, cfg, b_all, jax.random.PRNGKey(1))
    gz_half = gz_valid.at[2:].set(-1.0)
    b_half = dict(tile, gaze_seq=gz_half)
    _, m_half = bc_loss_fn(state.params, models, cfg, b_half, jax.random.PRNGKey(1))
    assert float(m_all["loss_reg"]) > 0.0
    np.testing.assert_allclose(
        float(m_half["loss_reg"]), float(m_all["loss_reg"]), rtol=1e-5
    )


def test_oreo_quantizer_masked_from_optimizer():
    """Frozen quantizer params must not move even with weight decay on."""
    cfg = small_cfg(dp_method="Oreo", **{"optimizer.weight_decay": 0.1})
    tx = build_optimizer(cfg.optimizer, cfg.scheduler, cfg.training, steps_per_epoch=2)
    models, state = init_bc_state(cfg, jax.random.PRNGKey(0), tx)
    step = make_bc_train_step(models, cfg, donate=False)
    batch = jax.tree.map(jnp.asarray, one_batch(cfg))
    new_state, _ = step(state, batch, jax.random.PRNGKey(1))
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params["quantizer"], new_state.params["quantizer"])
    assert max(jax.tree.leaves(diff)) == 0.0, "frozen quantizer was updated"


def test_partial_gaze_ratio_selects_fraction():
    """gaze.ratio must select ~ratio of samples (the old float content hash
    lost all fractional bits at frame-sum magnitudes and selected ALL
    samples for any ratio > 0)."""
    import jax
    import jax.numpy as jnp

    from gabril_carla_tpu.train.bc import bc_loss_fn, build_bc_models, init_bc_params
    from gabril_carla_tpu.utils import default_bc_config

    losses = {}
    for ratio in (0.0, 0.5, 1.0):
        cfg = default_bc_config()
        cfg["data"].update(img_height=24, img_width=48, frame_stack=2, batch_size=32)
        cfg["model"].update(embedding_dim=8, num_hiddens=16, num_residual_layers=1,
                            num_residual_hiddens=8, z_dim=16)
        cfg["gaze"].update(method="Reg", max_points=3, mask_sigma=4.0,
                           ratio=ratio, lambda_weight=1.0)
        cfg["training"]["compute_dtype"] = "float32"
        models = build_bc_models(cfg)
        params = init_bc_params(models, cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        batch = {
            "obs_seq": jnp.asarray(rng.integers(0, 255, (32, 2, 24, 48, 1), dtype=np.uint8)),
            "gaze_seq": jnp.asarray(rng.uniform(0, 1, (32, 2, 6)).astype(np.float32)),
            "actions": jnp.asarray(rng.uniform(-1, 1, (32, 7)).astype(np.float32)),
        }
        _, m = bc_loss_fn(params, models, cfg, batch, jax.random.PRNGKey(2))
        losses[ratio] = float(m["loss_reg"])
    assert losses[0.0] == 0.0
    assert losses[1.0] > 0.0
    # half the samples selected -> a genuinely different weighted mean
    assert losses[0.5] != losses[1.0]
