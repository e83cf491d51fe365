"""Multi-scenario routes: K scenario slots per WorldSpec.

The reference's RouteScenario drives *several* smaller scenarios along one
route (leaderboard/scenarios/route_scenario.py:55-56 "a scenario that
consists of driving along a pre-defined route, along which several smaller
scenarios are triggered"); bench2drive220 happens to carry one per route.
These tests cover the K>1 capability: resource partitioning across the
fixed pools, both phase machines running, noop padding for stacking, and
loud capacity failures.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gabril_carla_tpu.env import DrivingEnv
from gabril_carla_tpu.env.criteria import compute_score
from gabril_carla_tpu.env.world import build_world_spec, stack_specs


def _route(scenarios, rid=0, length=160.0):
    wps = np.stack([np.arange(0.0, length, 2.0),
                    np.zeros(int(length // 2))], 1).astype(np.float32)
    return {"id": rid, "town": "T", "waypoints": wps,
            "scenarios": scenarios, "weather": [0, 0, 0, 90]}


def _run(spec, steps=900, throttle=0.6):
    spec = jax.tree.map(jnp.asarray, spec)
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(0))

    def body(c, _):
        return env.step(spec, c, jnp.array([throttle, 0.0])), None

    st2, _ = jax.lax.scan(body, st, None, length=steps)
    return spec, st2


def test_single_scenario_route_has_k1_shapes():
    spec = build_world_spec(_route([{"type": "PedestrianCrossing",
                                     "trigger": (40.0, 0.0, 0.0)}]))
    assert spec.scenario_type.shape == (1,)
    assert spec.scen_aux.shape == (1, 4)
    assert spec.amb_clear.shape == (1, 2)
    assert int(spec.scen_walk_base[0]) == 0 and int(spec.scen_walk_n[0]) == 3


def test_two_scenarios_both_trigger():
    """Walker crossing at 30 m + hard-brake lead at 90 m on one route."""
    spec = build_world_spec(_route([
        {"type": "PedestrianCrossing", "trigger": (30.0, 0.0, 0.0)},
        {"type": "HardBreakRoute", "trigger": (90.0, 0.0, 0.0)},
    ]))
    assert list(np.asarray(spec.scenario_type)) == [6, 12]
    spec, st = _run(spec)
    phases = np.asarray(st.scenario.phase)
    assert phases[0] >= 1, "walker crossing never triggered"
    assert phases[1] >= 2, "hard-brake lead never braked"
    sc = compute_score(spec, st)
    # driving blind through the crosswalk hits walkers; the braking lead is
    # a separate vehicle event — both scenarios' criteria fold into one score
    assert int(sc["collisions_pedestrian"]) >= 1


def test_walker_windows_are_disjoint():
    spec = build_world_spec(_route([
        {"type": "PedestrianCrossing", "trigger": (30.0, 0.0, 0.0)},
        {"type": "DynamicObjectCrossing", "trigger": (90.0, 0.0, 0.0)},
    ]))
    base = np.asarray(spec.scen_walk_base)
    cnt = np.asarray(spec.scen_walk_n)
    assert list(base) == [0, 3] and list(cnt) == [3, 1]
    assert int(base[-1] + cnt[-1]) == 4
    # the second scenario's walker spawn spec landed past the first window
    assert float(np.linalg.norm(np.asarray(spec.walk_pos[3]))) > 0.0


def test_scripted_vehicle_bases_partition():
    """Cut-in (1 slot) then EV (1 reserved runtime slot) share the block."""
    spec = build_world_spec(_route([
        {"type": "ParkingCutIn", "trigger": (20.0, 0.0, 0.0)},
        {"type": "YieldToEmergencyVehicle", "trigger": (60.0, 0.0, 0.0),
         "distance": 20.0},
    ], length=240.0))
    assert list(np.asarray(spec.scen_veh_base)) == [0, 1]
    spec, st = _run(spec, steps=600)
    # the EV machine spawned its vehicle into ITS slot (1), not slot 0
    assert bool(np.asarray(st.vehicles.alive)[1])
    assert np.asarray(st.scenario.phase)[1] >= 1


def test_noop_padding_stacks_and_runs():
    a = build_world_spec(_route([{"type": "PedestrianCrossing",
                                  "trigger": (30.0, 0.0, 0.0)}], rid=1), n_scen=2)
    b = build_world_spec(_route([
        {"type": "PedestrianCrossing", "trigger": (30.0, 0.0, 0.0)},
        {"type": "HardBreakRoute", "trigger": (90.0, 0.0, 0.0)},
    ], rid=2), n_scen=2)
    assert list(np.asarray(a.scenario_type)) == [6, 0]
    specs = jax.tree.map(jnp.asarray, stack_specs([a, b]))
    env = DrivingEnv()
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    states = jax.vmap(env.reset)(specs, keys)

    def body(c, _):
        return jax.vmap(env.step, in_axes=(0, 0, None))(
            specs, c, jnp.array([0.5, 0.0])), None

    states, _ = jax.lax.scan(body, states, None, length=50)
    assert states.scenario.phase.shape == (2, 2)


def test_flow_slot_conflict_raises():
    with pytest.raises(ValueError, match="flow slot 0 already owned"):
        build_world_spec(_route([
            {"type": "CrossingBicycleFlow", "trigger": (40.0, 0.0, 0.0),
             "start_actor_flow": (50.0, -40.0), "end_actor_flow": (50.0, 40.0)},
            {"type": "MergerIntoSlowTrafficV2", "trigger": (100.0, 0.0, 0.0),
             "start_actor_flow": (110.0, -40.0), "end_actor_flow": (110.0, 40.0)},
        ]))


def test_scripted_slot_overflow_raises():
    hazards = [{"type": "HazardAtSideLane", "trigger": (20.0 + 40.0 * i, 0.0, 0.0)}
               for i in range(3)]  # 3 x 2 bicycles > 4 scripted slots
    with pytest.raises(ValueError, match="scripted vehicle slots overflow"):
        build_world_spec(_route(hazards, length=240.0))


def test_lane_allow_windows_union():
    """Two TwoWays scenarios each carry their own lane-allow window."""
    spec = build_world_spec(_route([
        {"type": "AccidentTwoWays", "trigger": (20.0, 0.0, 0.0), "distance": 20.0},
        {"type": "AccidentTwoWays", "trigger": (100.0, 0.0, 0.0), "distance": 20.0},
    ], length=300.0))
    la = np.asarray(spec.lane_allow)
    assert la.shape == (2, 2)
    assert la[0, 1] > la[0, 0] and la[1, 1] > la[1, 0]
    assert la[1, 0] > la[0, 1] - 20.0  # second window sits further down-route


def test_stop_sign_capacity_overflow_raises():
    """N_STOPS=2: a third stop-sign scenario must fail loudly at build."""
    scens = [{"type": "VanillaNonSignalizedTurnEncounterStopsign",
              "trigger": (30.0 + 40.0 * i, 0.0, 0.0)} for i in range(3)]
    with pytest.raises(ValueError, match="N_STOPS"):
        build_world_spec(_route(scens, length=220.0))
