"""Env smoke + behavior tests on a synthetic straight route (no XML needed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gabril_carla_tpu.env import DrivingEnv
from gabril_carla_tpu.env.world import WorldSpec, build_world_spec, stack_specs
from gabril_carla_tpu.env.criteria import compute_score, completion_pct


def straight_route(length=200, scenario="None", extra=None):
    wps = np.stack([np.arange(0.0, length, 2.0), np.zeros(length // 2)], axis=1).astype(np.float32)
    scen = {"type": scenario, "trigger": (30.0, 0.0, 0.0)}
    if extra:
        scen.update(extra)
    return {"id": 1, "town": "TownX", "waypoints": wps, "scenarios": [scen],
            "weather": [0, 0, 0, 90]}


def sterile(route):
    """Spec without ambient traffic (tests that need an empty road)."""
    return jax.tree.map(jnp.asarray, build_world_spec(route, ambient=False))


FULL_THROTTLE = jnp.asarray([1.0, 0.0, 0.0, 0, 0, 0, 0.0])
BRAKE = jnp.asarray([0.0, 0.0, 1.0, 0, 0, 0, 0.0])


def rollout(spec, policy_action, steps=400):
    env = DrivingEnv()
    state = env.reset(spec, jax.random.PRNGKey(0))

    def body(s, _):
        s = env.step(spec, s, policy_action)
        return s, s.ego.pos

    state, _ = jax.lax.scan(body, state, None, length=steps)
    return state


def test_drive_straight_completes_route():
    spec = sterile(straight_route(140))
    state = rollout(spec, FULL_THROTTLE, steps=600)
    pct = float(completion_pct(spec, state))
    assert pct == 100.0
    score = compute_score(spec, state)
    assert float(score["score_composed"]) == 100.0
    assert bool(state.done)


def test_braking_blocks_eventually():
    spec = build_world_spec(straight_route(140))
    spec = jax.tree.map(jnp.asarray, spec)
    env = DrivingEnv()
    state = env.reset(spec, jax.random.PRNGKey(0))
    # stand still 30 s: not yet blocked (threshold is 180 s)
    def body(s, _):
        return env.step(spec, s, BRAKE), None
    state, _ = jax.lax.scan(body, state, None, length=600)
    assert not bool(state.criteria.blocked)
    assert float(state.criteria.blocked_time) > 25.0


def test_blocked_intersection_scenario_triggers():
    spec = build_world_spec(straight_route(200, "BlockedIntersection"))
    spec = jax.tree.map(jnp.asarray, spec)
    env = DrivingEnv()
    state = env.reset(spec, jax.random.PRNGKey(0))
    assert bool(state.vehicles.alive[0])  # blocker pre-placed
    state = rollout(spec, FULL_THROTTLE, steps=500)
    # ego driving full throttle into the blocker either collides or the
    # blocker eventually drives away; scenario must have activated
    assert int(state.scenario.phase[0]) >= 1


def test_vmapped_mixed_scenarios():
    specs = [
        build_world_spec(straight_route(140, "None")),
        build_world_spec(straight_route(200, "BlockedIntersection")),
        build_world_spec(straight_route(200, "PedestrianCrossing")),
        build_world_spec(
            straight_route(200, "CrossingBicycleFlow",
                           {"start_actor_flow": (60.0, 30.0), "end_actor_flow": (60.0, -30.0),
                            "flow_speed": 8.0, "source_dist_interval": (10.0, 20.0)})
        ),
    ]
    batched = jax.tree.map(jnp.asarray, stack_specs(specs))
    env = DrivingEnv()
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states = jax.vmap(env.reset)(batched, keys)

    def body(ss, _):
        ss = jax.vmap(lambda sp, st: env.step(sp, st, FULL_THROTTLE))(batched, ss)
        return ss, None

    states, _ = jax.lax.scan(body, states, None, length=300)
    pcts = jax.vmap(completion_pct)(batched, states)
    assert np.all(np.asarray(pcts) > 10.0)  # all worlds progressed
    scores = jax.vmap(lambda sp, st: compute_score(sp, st)["score_composed"])(batched, states)
    assert np.all(np.isfinite(np.asarray(scores)))


def _with_light(spec, stop_s, green_s, yellow_s, red_s, offset):
    """Install one traffic light into a spec (flax struct replace)."""
    def arr(v):
        return jnp.zeros_like(spec.tl_stop_s).at[0].set(v)
    return spec.replace(
        tl_stop_s=arr(stop_s), tl_offset=arr(offset),
        tl_green_s=arr(green_s), tl_yellow_s=arr(yellow_s), tl_red_s=arr(red_s),
        n_tl=jnp.asarray(1, jnp.int32),
    )


def test_red_light_infraction_end_to_end():
    """A brakeless policy crossing the stop line on red incurs the 0.7
    penalty (RunningRedLightTest, atomic_criteria.py:1620)."""
    spec = sterile(straight_route(140))
    # red from t=0 for 120 s: green 1 s, yellow 0, red 120, offset 1
    spec = _with_light(spec, 60.0, 1.0, 0.0, 120.0, 1.0)
    state = rollout(spec, FULL_THROTTLE, steps=600)
    score = compute_score(spec, state)
    assert int(score["red_light"]) == 1
    assert float(score["score_route"]) == 100.0
    assert float(score["score_composed"]) == pytest.approx(70.0, abs=0.5)


def test_expert_waits_for_green():
    """The privileged expert holds at a red light and crosses after it turns
    green — no infraction, full completion."""
    from gabril_carla_tpu.env.expert import expert_action

    spec = sterile(straight_route(140))
    # red for the first 20 s, then green for 1000 s
    spec = _with_light(spec, 60.0, 1000.0, 0.0, 20.0, 1000.0)
    env = DrivingEnv()
    state = env.reset(spec, jax.random.PRNGKey(0))

    def body(s, _):
        s = env.step(spec, s, expert_action(spec, s))
        return s, (s.ego.route_idx, s.ego.speed)

    state, (idx_trace, speed_trace) = jax.lax.scan(body, state, None, length=1200)
    score = compute_score(spec, state)
    assert int(score["red_light"]) == 0
    assert float(score["score_composed"]) == 100.0
    # it actually waited: ego stationary before the line while red
    held = np.asarray((idx_trace < 60) & (speed_trace < 0.3))
    assert held.sum() > 100


def test_stop_sign_infraction_end_to_end():
    """Blowing through a stop-sign zone costs the 0.8 penalty once
    (RunningStopTest, atomic_criteria.py:1799)."""
    spec = sterile(straight_route(140, scenario="VanillaNonSignalizedTurnEncounterStopsign"))
    assert int(spec.n_stop) == 1
    state = rollout(spec, FULL_THROTTLE, steps=600)
    score = compute_score(spec, state)
    assert int(score["stop_infraction"]) == 1
    assert float(score["score_composed"]) == pytest.approx(80.0, abs=0.5)


def test_crossing_bicycle_flow_gets_frozen_light():
    """CrossingBicycleFlow junctions carry the red-5s-then-green profile
    (cross_bicycle_flow.py:82,167-172)."""
    spec = build_world_spec(straight_route(
        200, scenario="CrossingBicycleFlow",
        extra={"start_actor_flow": (60.0, -30.0), "end_actor_flow": (60.0, 30.0),
               "flow_speed": 8.0, "source_dist_interval": (20.0, 40.0)}))
    assert int(spec.n_tl) >= 1
    assert float(spec.tl_red_s[0]) == 5.0
    assert float(spec.tl_green_s[0]) == 1e6
    from gabril_carla_tpu.env.traffic_lights import light_state, GREEN, RED
    col0 = int(light_state(0.0, spec.tl_offset[0], spec.tl_green_s[0],
                           spec.tl_yellow_s[0], spec.tl_red_s[0]))
    col9 = int(light_state(9.0, spec.tl_offset[0], spec.tl_green_s[0],
                           spec.tl_yellow_s[0], spec.tl_red_s[0]))
    assert col0 == RED and col9 == GREEN


def test_traffic_light_renders_lamps():
    """The signal head renders: a bright lamp appears when approaching."""
    from gabril_carla_tpu.ops.raster import render_frame

    spec = sterile(straight_route(140))
    spec = _with_light(spec, 40.0, 1.0, 0.0, 120.0, 1.0)  # red ahead
    env = DrivingEnv()
    state = env.reset(spec, jax.random.PRNGKey(0))
    # drive 20 m closer so the head is a few pixels tall
    def body(s, _):
        return env.step(spec, s, FULL_THROTTLE), None
    state, _ = jax.lax.scan(body, state, None, length=80)
    img = np.asarray(render_frame(spec, state))
    spec_off = spec.replace(n_tl=jnp.asarray(0, jnp.int32))
    img_off = np.asarray(render_frame(spec_off, state))
    diff = np.abs(img - img_off)
    # the pole + head appear above the horizon (upper half of the image)
    assert (diff[:90] > 0.05).sum() >= 4
    # and the brightest changed pixel is the lit lamp (brighter than the pole)
    assert img[:90][diff[:90] > 0.05].max() > 0.7


def test_lane_follow_tracks_polyline_beyond_pool_size():
    """Regression: batched_point clipped the polyline index against the
    ACTOR count (shape[0] of the [N, M, 2] batch), pinning every actor past
    arclength N-2 onto a linear extrapolation of one early segment — wrong
    position and heading on every curved route."""
    from gabril_carla_tpu.env import constants as C
    from gabril_carla_tpu.env.dynamics import vehicles_step
    from gabril_carla_tpu.env.state import ActorPool

    # a 90-degree arc so extrapolation diverges hard from the true polyline
    t = np.linspace(0, np.pi / 2, 60)
    wps = np.stack([80 * np.sin(t), 80 * (1 - np.cos(t))], 1).astype(np.float32)
    spec = sterile({"id": 1, "town": "T", "waypoints": wps,
                    "scenarios": [{"type": "None", "trigger": (1.0, 0.0, 0.0)}],
                    "weather": [0, 0, 0, 90]})
    pool = ActorPool.empty()
    s_far = float(C.N_VEHICLES) + 30.0  # beyond the old (wrong) clip bound
    pool = pool.replace(
        mode=pool.mode.at[0].set(2), alive=pool.alive.at[0].set(True),
        flow_s=pool.flow_s.at[0].set(s_far),
        lane_offset=pool.lane_offset.at[0].set(0.0),
        direction=pool.direction.at[0].set(1.0),
    )
    out = vehicles_step(pool, spec)
    i = int(s_far)
    expected = np.asarray(spec.route_xy[i])
    assert np.linalg.norm(np.asarray(out.pos[0]) - expected) < 1.5
