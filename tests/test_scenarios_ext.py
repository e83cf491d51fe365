"""Extended scenario-type coverage: all 44 bench2drive220 types.

Families beyond the 10 benchmark tasks: obstacle variants, junction-turn
crossing flows, junction adversaries, yield-to-emergency, hard-braking lead,
control loss, parking exit, invading turns (srunner/scenarios/*.py).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gabril_carla_tpu.env import DrivingEnv
from gabril_carla_tpu.env.criteria import compute_score
from gabril_carla_tpu.env.expert import expert_action
from gabril_carla_tpu.data.vendored import routes_path
from gabril_carla_tpu.env.world import SCENARIO_TYPES, build_world_spec, parse_routes

XML = str(routes_path())  # vendored routes220.json.gz (reference XML fallback)


def straight(n=300):
    return np.stack([np.arange(0.0, n, 2.0), np.zeros(n // 2)], 1).astype(np.float32)


def l_shaped():
    """Straight, 90-degree left turn at ~100 m, straight again."""
    a = np.stack([np.arange(0.0, 100, 2.0), np.zeros(50)], 1)
    th = np.linspace(0, np.pi / 2, 16)[1:]
    r = 12.0
    arc = np.stack([100.0 + r * np.sin(th), -(r - r * np.cos(th))], 1)
    b0 = arc[-1]
    b = b0 + np.stack([np.zeros(40), -np.arange(2.0, 82, 2.0)], 1)
    return np.concatenate([a, arc, b]).astype(np.float32)


def mk(wps, scen):
    return jax.tree.map(jnp.asarray, build_world_spec(
        {"id": 7, "town": "T", "waypoints": wps, "scenarios": [scen],
         "weather": [0, 0, 0, 90]}))


def drive(spec, action, steps=500):
    env = DrivingEnv()
    act = jnp.asarray(action, jnp.float32)
    return jax.jit(lambda k: jax.lax.scan(
        lambda s, _: (env.step(spec, s, act), None), env.reset(spec, k), None,
        length=steps)[0])(jax.random.PRNGKey(0))


def drive_expert(spec, steps=700):
    env = DrivingEnv()

    def tick(s, _):
        return env.step(spec, s, expert_action(spec, s)), None

    return jax.jit(lambda k: jax.lax.scan(tick, env.reset(spec, k), None,
                                          length=steps)[0])(jax.random.PRNGKey(0))


@pytest.mark.skipif(not os.path.exists(XML), reason="reference routes absent")
def test_all_220_routes_compile():
    """Every route of bench2drive220 builds a WorldSpec (no silent skips)."""
    routes = parse_routes(XML)
    assert len(routes) == 220
    unknown = []
    for rid, r in routes.items():
        t = r["scenarios"][0]["type"]
        if t not in SCENARIO_TYPES:
            unknown.append(t)
        spec = build_world_spec(r)
        assert int(spec.n_route) > 10, rid
    assert not unknown, f"unmapped scenario types: {set(unknown)}"


def test_obstacle_family_layouts():
    w = straight()
    acc = mk(w, {"type": "Accident", "trigger": (40.0, 0.0, 0.0), "distance": 30.0})
    assert int(np.sum(np.asarray(acc.statics_alive)[:8])) == 3
    assert not bool(np.asarray(acc.flow_enabled)[1])  # no oncoming flow
    con = mk(w, {"type": "ConstructionObstacleTwoWays", "trigger": (40.0, 0.0, 0.0),
                 "distance": 30.0, "frequency": (40.0, 80.0)})
    assert int(np.sum(np.asarray(con.statics_alive)[:8])) == 4
    assert bool(np.asarray(con.flow_enabled)[1])  # TwoWays -> oncoming flow
    po = mk(w, {"type": "ParkedObstacle", "trigger": (40.0, 0.0, 0.0), "distance": 30.0})
    assert int(np.sum(np.asarray(po.statics_alive)[:8])) == 1


def test_junction_turn_flow_synthesized():
    spec = mk(l_shaped(), {"type": "SignalizedJunctionLeftTurn",
                           "trigger": (80.0, 0.0, 0.0), "flow_speed": 9.0,
                           "source_dist_interval": (15.0, 25.0)})
    assert bool(np.asarray(spec.flow_enabled)[0])
    # the synthesized crossing flow passes near the route
    fl = np.asarray(spec.flow_xy)[0][: int(np.asarray(spec.flow_len)[0])]
    xy = np.asarray(spec.route_xy)[: int(spec.n_route)]
    dmin = np.linalg.norm(xy[:, None] - fl[None], axis=-1).min()
    assert dmin < 6.0
    assert int(spec.n_tl) >= 1  # signalized -> a working light
    nos = mk(l_shaped(), {"type": "NonSignalizedJunctionRightTurn",
                          "trigger": (80.0, 0.0, 0.0), "flow_speed": 9.0,
                          "source_dist_interval": (15.0, 25.0)})
    # non-signalized: no light within the scenario's junction window
    tls = np.asarray(nos.tl_stop_s)[: int(nos.n_tl)]
    assert not np.any(np.abs(tls - float(nos.trigger_s[0])) < 60.0)


def test_vanilla_red_light_phased_at_arrival():
    from gabril_carla_tpu.env.traffic_lights import GREEN, light_state

    spec = mk(l_shaped(), {"type": "VanillaSignalizedTurnEncounterRedLight",
                           "trigger": (90.0, 0.0, 0.0)})
    assert int(spec.n_tl) >= 1
    k = int(np.argmin(np.abs(np.asarray(spec.tl_stop_s)[: int(spec.n_tl)]
                             - float(spec.trigger_s[0]))))
    arrival = float(np.asarray(spec.tl_stop_s)[k]) / 6.0
    col = light_state(jnp.asarray(arrival), spec.tl_offset, spec.tl_green_s,
                      spec.tl_yellow_s, spec.tl_red_s)
    assert int(np.asarray(col)[k]) != int(GREEN)


def test_yield_emergency_blocking_fails():
    """Ego crawls in the lane center; the EV piles up behind -> 0.7 penalty."""
    spec = mk(straight(400), {"type": "YieldToEmergencyVehicle",
                              "trigger": (6.0, 0.0, 0.0), "distance": 25.0})
    st = drive(spec, [0.25, 0, 0, 0, 0, 0, 0], steps=900)  # slow crawl
    assert bool(np.asarray(st.vehicles.alive)[0])  # EV spawned
    assert float(np.asarray(st.scenario.aux)[0]) > 8.0  # held up
    sc = compute_score(spec, st)
    assert bool(np.asarray(sc["yield_emergency"]))
    assert float(sc["score_penalty"]) <= 0.71


def test_yield_emergency_expert_yields():
    spec = mk(straight(400), {"type": "YieldToEmergencyVehicle",
                              "trigger": (6.0, 0.0, 0.0), "distance": 25.0})
    st = drive_expert(spec, steps=900)
    sc = compute_score(spec, st)
    assert not bool(np.asarray(sc["yield_emergency"]))


def test_hard_brake_lead_spawns_and_brakes():
    spec = mk(straight(400), {"type": "HardBreakRoute", "trigger": (50.0, 0.0, 0.0)})
    st = drive(spec, [0.6, 0, 0, 0, 0, 0, 0], steps=600)
    assert int(np.asarray(st.scenario.phase)[0]) >= 2  # brake phase reached
    # blind full-throttle ego rear-ends the braking lead
    sc = compute_score(spec, st)
    assert int(sc["collisions_vehicle"]) >= 1


def test_junction_adversary_crosses():
    spec = mk(l_shaped(), {"type": "OppositeVehicleTakingPriority",
                           "trigger": (85.0, 0.0, 0.0), "direction": "right"})
    st0 = DrivingEnv().reset(spec, jax.random.PRNGKey(0))
    assert bool(np.asarray(st0.vehicles.alive)[0])
    assert int(np.asarray(st0.vehicles.mode)[0]) == 0  # parked until trigger
    st = drive(spec, [0.5, 0, 0, 0, 0, 0, 0], steps=500)
    assert int(np.asarray(st.scenario.phase)[0]) >= 1  # triggered
    moved = np.linalg.norm(
        np.asarray(st.vehicles.pos)[0] - np.asarray(st0.vehicles.pos)[0])
    despawned = not bool(np.asarray(st.vehicles.alive)[0])
    assert despawned or moved > 3.0  # the adversary drove its crossing line


def test_control_loss_perturbs_heading():
    base = {"trigger": (60.0, 0.0, 0.0)}
    spec = mk(straight(400), {"type": "ControlLoss", **base})
    ref = mk(straight(400), {"type": "None", **base})
    st = drive(spec, [0.5, 0, 0, 0, 0, 0, 0], steps=320)
    st_ref = drive(ref, [0.5, 0, 0, 0, 0, 0, 0], steps=320)
    dev = abs(float(st.ego.pos[1]) - float(st_ref.ego.pos[1]))
    assert int(np.asarray(st.scenario.phase)[0]) >= 1
    assert dev > 0.05  # the wobble displaced the blind ego


def test_parking_exit_layout_and_expert():
    spec = mk(straight(300), {"type": "ParkingExit", "trigger": (2.0, 0.0, 0.0),
                              "front_vehicle_distance": 9.0,
                              "behind_vehicle_distance": 9.0})
    # ego spawns beside the lane, hemmed by two parked cars
    off = np.linalg.norm(np.asarray(spec.spawn_pos) - np.asarray(spec.route_xy)[0])
    assert 2.0 < off < 3.5
    assert int(np.sum(np.asarray(spec.statics_alive)[:8])) == 2
    st = drive_expert(spec, steps=500)
    sc = compute_score(spec, st)
    assert float(sc["score_route"]) > 40.0  # pulled out and made progress


def test_invading_turn_flow_offset():
    spec = mk(straight(400), {"type": "InvadingTurn", "trigger": (40.0, 0.0, 0.0),
                              "distance": 60.0, "offset": 0.3})
    assert bool(np.asarray(spec.flow_enabled)[1])
    # the oncoming line sits closer than a full lane width
    fl = np.asarray(spec.flow_xy)[1][: max(int(np.asarray(spec.flow_len)[1]), 2)]
    xy = np.asarray(spec.route_xy)[: int(spec.n_route)]
    d = np.linalg.norm(fl[:, None] - xy[None], axis=-1).min(axis=1)
    assert 1.5 < d.mean() < 3.0
