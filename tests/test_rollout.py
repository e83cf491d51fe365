"""Closed-loop rollout builder: heat paths, warm-up no-ops, hard stop."""

import numpy as np
import jax
import jax.numpy as jnp

from gabril_carla_tpu.env.world import build_world_spec
from gabril_carla_tpu.eval.rollout import make_rollout_fn
from gabril_carla_tpu.train.bc import build_bc_models, init_bc_params, make_bc_policy_fn
from gabril_carla_tpu.utils import default_bc_config


def tiny_cfg(**gaze_over):
    cfg = default_bc_config()
    cfg["model"].update(embedding_dim=4, num_hiddens=8, num_residual_layers=1,
                        num_residual_hiddens=4, z_dim=8)
    cfg["gaze"].update(mask_sigma=10.0, **gaze_over)
    cfg["training"]["compute_dtype"] = "float32"
    return cfg


def spec_straight():
    wps = np.stack([np.arange(0.0, 120, 2.0), np.zeros(60)], 1).astype(np.float32)
    return jax.tree.map(jnp.asarray, build_world_spec(
        {"id": 5, "town": "T", "waypoints": wps,
         "scenarios": [{"type": "PedestrianCrossing", "trigger": (30.0, 0.0, 0.0)}],
         "weather": [0, 0, 0, 90]}))


def test_rollout_with_analytic_gaze_heat():
    cfg = tiny_cfg(method="ViSaRL")
    models = build_bc_models(cfg)
    params = init_bc_params(models, cfg, jax.random.PRNGKey(0))
    policy = make_bc_policy_fn(models, cfg)
    roll = make_rollout_fn(lambda p, o, h=None: policy(p, o, h), cfg, steps=15,
                           use_analytic_gaze=True)
    state, trace = jax.jit(roll)(spec_straight(), params, jax.random.PRNGKey(0))
    assert int(state.t) == 15
    assert np.all(np.isfinite(np.asarray(trace)))


def test_warmup_noops_keep_ego_stationary():
    cfg = tiny_cfg(method="None")
    models = build_bc_models(cfg)
    params = init_bc_params(models, cfg, jax.random.PRNGKey(0))
    policy = make_bc_policy_fn(models, cfg)
    roll = make_rollout_fn(lambda p, o, h=None: policy(p, o, h), cfg, steps=9)
    state, _ = jax.jit(roll)(spec_straight(), params, jax.random.PRNGKey(0))
    # 9 < WARMUP_STEPS=10 -> only brake no-ops applied (bc_agent.py:404)
    np.testing.assert_allclose(float(state.ego.speed), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.ego.pos), [0.0, 0.0], atol=1e-5)
