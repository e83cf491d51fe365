"""Driving-score composition + stats.json schema parity.

Penalty table and composition from statistics_manager.py:21-37,349-416;
record schema from :69-163; aggregation from calc_scores.py:8-60.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gabril_carla_tpu.env.criteria import compute_score
from gabril_carla_tpu.env.state import Criteria, SceneState, ScenarioState
from gabril_carla_tpu.eval.stats import aggregate_scores, route_record


def state_with(spec, **crit_over):
    from gabril_carla_tpu.env import DrivingEnv

    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(0))
    crit = st.criteria
    for k, v in crit_over.items():
        crit = crit.replace(**{k: jnp.asarray(v)})
    return st.replace(criteria=crit)


def full_route_state(spec, st):
    # teleport to the goal with 100% completion
    goal_idx = int(spec.n_route) - 1
    return st.replace(
        ego=st.ego.replace(pos=spec.route_xy[goal_idx], route_idx=jnp.asarray(goal_idx, jnp.int32)),
        t=jnp.asarray(400, jnp.int32),
    )


def make_spec():
    from gabril_carla_tpu.env.world import build_world_spec

    wps = np.stack([np.arange(0.0, 100, 2.0), np.zeros(50)], 1).astype(np.float32)
    return jax.tree.map(jnp.asarray, build_world_spec(
        {"id": 9, "town": "T", "waypoints": wps, "scenarios": [], "weather": [0, 0, 0, 90]}))


def test_penalty_products():
    spec = make_spec()
    st = full_route_state(spec, state_with(spec, collisions_pedestrian=np.int32(1),
                                           collisions_vehicle=np.int32(2), red_light=np.int32(1)))
    sc = compute_score(spec, st)
    # 0.5 * 0.6^2 * 0.7 = 0.126
    np.testing.assert_allclose(float(sc["score_penalty"]), 0.5 * 0.36 * 0.7, rtol=1e-5)
    np.testing.assert_allclose(float(sc["score_composed"]), 100 * 0.126, rtol=1e-5)


def test_outside_lane_percentage_penalty():
    spec = make_spec()
    st = state_with(spec, outside_lane_m=np.float32(20.0), driven_m=np.float32(100.0))
    st = full_route_state(spec, st)
    sc = compute_score(spec, st)
    np.testing.assert_allclose(float(sc["score_penalty"]), 1.0 - 0.2, rtol=1e-5)


def test_route_record_schema_and_status():
    spec = make_spec()
    st = full_route_state(spec, state_with(spec))
    rec = route_record(9, 400, compute_score(spec, st), duration_game=20.0, route_length=99.0)
    assert rec["status"] == "Perfect"
    assert set(rec["scores"]) == {"score_route", "score_penalty", "score_composed"}
    assert rec["meta"]["route_length"] == 99.0
    st2 = full_route_state(spec, state_with(spec, collisions_vehicle=np.int32(1)))
    rec2 = route_record(9, 401, compute_score(spec, st2), duration_game=20.0)
    assert rec2["status"] == "Completed"
    assert rec2["num_infractions"] == 1


def test_aggregate_scores_mean_per_route():
    recs = [
        {"route_id": "RouteScenario_1", "scores": {"score_composed": 80.0}},
        {"route_id": "RouteScenario_1", "scores": {"score_composed": 60.0}},
        {"route_id": "RouteScenario_2", "scores": {"score_composed": 100.0}},
    ]
    agg = aggregate_scores(recs)
    assert agg["mean"] == 80.0
    assert agg["per_route"]["RouteScenario_1"] == 70.0
    assert agg["n"] == 3


def test_route_record_checkpoint_wrapper():
    """calc_scores.py:77 reads _checkpoint.global_record.scores_mean — emit it."""
    spec = make_spec()
    st = full_route_state(spec, state_with(spec, collisions_vehicle=np.int32(1)))
    rec = route_record(9, 400, compute_score(spec, st), duration_game=20.0,
                       route_length=150.0)
    gr = rec["_checkpoint"]["global_record"]
    assert gr["scores_mean"] == rec["scores"]
    assert gr["meta"]["total_length"] == 150.0
    assert gr["infractions"]["collisions_vehicle"] > 0  # per-km rate
    assert "yield_emergency_vehicle_infractions" in gr["infractions"]
    assert rec["_checkpoint"]["records"][0]["scores"] == rec["scores"]
    assert "_checkpoint" not in rec["_checkpoint"]["records"][0]
