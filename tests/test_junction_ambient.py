"""Ambient junction crossing traffic (BackgroundBehavior's junction sources).

The reference populates junctions near the ego with background actors
entering from the crossing roads (srunner/scenarios/background_activity.py:165+,
junction sources). The TPU rebuild routes that through flow slot 0 when no
scenario owns it (env/world.py junction-ambient synthesis) with a hold rule
in env/ambient.py: crossing traffic obeys the junction signal (moves while
the ego's light is red) or yields to a nearby ego when unsignalized.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gabril_carla_tpu.env import DrivingEnv
from gabril_carla_tpu.env.ambient import ambient_speeds
from gabril_carla_tpu.env.criteria import compute_score
from gabril_carla_tpu.env.dynamics import FLOW0_START, FLOW1_START
from gabril_carla_tpu.env.expert import expert_action
from gabril_carla_tpu.env.world import build_world_spec


def turn_route(leg1=140.0, leg2=120.0, scenarios=None, rid=2, **kw):
    """Straight +x leg, 90-degree corner, straight +y leg."""
    a = np.stack([np.arange(0.0, leg1, 2.0), np.zeros(int(leg1 // 2))], 1)
    b = np.stack([np.full(int(leg2 // 2), leg1 - 2.0),
                  np.arange(2.0, leg2 + 2.0, 2.0)], 1)
    wps = np.concatenate([a, b]).astype(np.float32)
    scen = scenarios if scenarios is not None else [{"type": "None"}]
    return build_world_spec(
        {"id": rid, "town": "T", "waypoints": wps, "scenarios": scen,
         "weather": [0, 0, 0, 90]}, **kw)


def roll_expert(spec, steps):
    spec = jax.tree.map(jnp.asarray, spec)
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(5))

    def body(s, _):
        s = env.step(spec, s, expert_action(spec, s))
        jf = s.vehicles.alive[FLOW0_START:FLOW1_START]
        return s, (jf.sum(), s.vehicles.speed[FLOW0_START:FLOW1_START].max())

    return jax.lax.scan(body, st, None, length=steps)


def test_passive_turn_route_gets_junction_flow():
    spec = turn_route(junction_traffic=True)
    assert bool(spec.jct_flow)
    assert bool(spec.flow_enabled[0])
    assert float(spec.flow_speed[0]) == 7.0
    # crossing sits past the junction-entry light; that light governs it
    assert int(spec.jct_signal) >= 0
    k = int(spec.jct_signal)
    assert abs(float(spec.tl_stop_s[k]) + 8.0 - float(spec.jct_cross_s)) < 1.0
    # hold line is short of the ego corridor on the flow polyline
    assert 0.0 < float(spec.jct_hold_s) < float(spec.flow_len[0])


def test_default_off_and_flag_off_build_identically():
    """JUNCTION_TRAFFIC_DEFAULT=False keeps pre-flip builds bit-identical."""
    a, b = turn_route(), turn_route(junction_traffic=False)
    assert not bool(a.jct_flow) and not bool(b.jct_flow)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_scenario_owned_flow_blocks_junction_traffic():
    """A flow-using scenario keeps flow slot 0 — no ambient overwrite."""
    spec = turn_route(scenarios=[{
        "type": "SignalizedJunctionLeftTurn", "trigger": (100.0, 0.0, 0.0)}],
        junction_traffic=True)
    assert not bool(spec.jct_flow)
    assert float(spec.flow_speed[0]) == 10.0  # the scenario's own flow


def test_ambient_disabled_blocks_junction_traffic():
    spec = turn_route(ambient=False, junction_traffic=True)
    assert not bool(spec.jct_flow)


def test_crossing_traffic_flows_and_recycles():
    spec = turn_route(junction_traffic=True)
    st, (alive_trace, _) = jax.jit(roll_expert, static_argnums=1)(spec, 700)
    alive = np.asarray(alive_trace)
    # crossing traffic exists for most of the drive (source->sink recycling)
    assert (alive >= 1).mean() > 0.8
    # and counts as background for the min-speed measuring stick
    spec_j = jax.tree.map(jnp.asarray, spec)
    assert ambient_speeds(st.vehicles, spec_j)[1] or alive[-1] == 0


def test_signal_hold_blocks_crossers_on_ego_green():
    """While the ego's light is green the crossing road has red: no crossing
    actor may pass the hold line; when the ego's light is red they flow."""
    spec = jax.tree.map(jnp.asarray, turn_route(junction_traffic=True))
    from gabril_carla_tpu.env.traffic_lights import GREEN, light_state

    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(1))
    hold_s = float(spec.jct_hold_s)
    k = int(spec.jct_signal)
    crossed_during_green = []
    moving_during_red = []

    def body(s, _):
        s = env.step(spec, s, jnp.zeros(7))  # ego parked at spawn, far away
        t_s = s.t.astype(jnp.float32) * 0.05
        col = light_state(t_s, spec.tl_offset, spec.tl_green_s,
                          spec.tl_yellow_s, spec.tl_red_s)[k]
        jf_alive = s.vehicles.alive[FLOW0_START:FLOW1_START]
        jf_s = s.vehicles.flow_s[FLOW0_START:FLOW1_START]
        jf_v = s.vehicles.speed[FLOW0_START:FLOW1_START]
        # an actor past the hold line that was behind it last tick = a crossing
        just_crossed = jnp.any(jf_alive & (jf_s >= hold_s) & (jf_s < hold_s + 0.5))
        moving = jnp.any(jf_alive & (jf_v > 3.0) & (jf_s > hold_s - 5.0) & (jf_s < hold_s))
        return s, (col == GREEN, just_crossed, moving)

    # ego sits at spawn ~100 m away -> unsignalized yield never engages;
    # only the signal governs the crossers
    st, (green, crossed, moving) = jax.lax.scan(body, st, None, length=1200)
    green, crossed, moving = map(np.asarray, (green, crossed, moving))
    # entering the corridor on the ego's green is forbidden (allow the very
    # first ticks of green: an actor mid-crossing clears the junction)
    for i in range(40, len(green)):
        if green[i] and green[i - 30:i].all():
            assert not crossed[i], f"crosser entered corridor on ego-green at tick {i}"
    # and traffic does cross while the ego's light is red
    assert crossed[~green].any()


def test_expert_clean_through_ambient_junction():
    """The expert negotiates the junction with crossing ambient traffic:
    no collisions, route completed."""
    spec = turn_route(junction_traffic=True)
    st, _ = jax.jit(roll_expert, static_argnums=1)(spec, 2600)
    score = compute_score(jax.tree.map(jnp.asarray, spec), st)
    assert int(score["collisions_vehicle"]) == 0
    assert int(score["collisions_pedestrian"]) == 0
    assert float(score["score_route"]) > 95.0


def test_unsignalized_crossers_yield_to_approaching_ego():
    """Without a governing light, crossing traffic holds while the ego is
    at/approaching the junction."""
    spec = turn_route(junction_traffic=True)
    # strip the signal: force the unsignalized yield path
    spec = spec.replace(jct_signal=np.int32(-1))
    spec = jax.tree.map(jnp.asarray, spec)
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(2))
    cross_s = float(spec.jct_cross_s)
    hold_s = float(spec.jct_hold_s)

    def body(s, _):
        ego_sf = s.ego.route_idx.astype(jnp.float32)
        # the yield predicate of env/ambient.py: a moving-or-very-close ego
        # near the junction blocks crossers; a legally stopped distant ego
        # does not dam the crossing road
        threat = ((ego_sf > cross_s - 35.0) & (ego_sf < cross_s + 6.0)
                  & ((s.ego.speed > 1.0) | (jnp.abs(ego_sf - cross_s) < 12.0)))
        s = env.step(spec, s, expert_action(spec, s))
        jf_alive = s.vehicles.alive[FLOW0_START:FLOW1_START]
        jf_s = s.vehicles.flow_s[FLOW0_START:FLOW1_START]
        entered = jnp.any(jf_alive & (jf_s >= hold_s) & (jf_s < hold_s + 0.5))
        return s, (threat, entered)

    st, (near, entered) = jax.lax.scan(body, st, None, length=2600)
    near, entered = map(np.asarray, (near, entered))
    # no crosser may enter the corridor while the ego is a threat (grace
    # ticks: an actor that entered just before the window opened clears)
    bad = near & entered
    for i in range(len(bad)):
        if bad[i] and near[max(0, i - 25):i].all():
            raise AssertionError(f"crosser entered while ego near at tick {i}")
    assert int(st.criteria.collisions_vehicle) == 0
