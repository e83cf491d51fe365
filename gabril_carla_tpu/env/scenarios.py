"""Scenario logic as maskable phase machines (py_trees -> lax, SURVEY §7).

Each Bench2Drive scenario type from the benchmark's 10 tasks becomes a pure
function advancing a small integer phase machine plus the shared flow-spawner.
A route carries K scenario slots (the reference's RouteScenario drives
*several* smaller scenarios along one route, route_scenario.py:55-56); K is a
per-build static shape, so the step unrolls one lax.switch per slot and a
single-scenario route compiles to exactly the one-switch program. Every
branch reads/writes the same fixed-shape SceneState, addressing its own
resources through the slot's compile-time windows (WorldSpec.scen_veh_base /
scen_walk_base / scen_walk_n), so the whole thing vmaps over mixed batches
of different scenario types.

Behavioral contracts: srunner/scenarios/parking_cut_in.py:41-44 (cut-in at
35 m, 13 m/s), blocked_intersection.py:63-67 (blocker 5 m in, trigger at 13 m,
leaves after a pause), object_crash_vehicle.py:168,265 (walker 2 m/s behind a
blocker), pedestrian_crossing.py:63-66 (1.3-2 m/s, trigger at 12 m),
route_obstacles.py / vehicle_opens_door.py (static obstruction + oncoming
flow), actor_flow.py / cross_bicycle_flow.py (source->sink flows with
uniform-gap spawning, scenario timeout 240 s).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import constants as C
from .dynamics import FLOW0_START, FLOW1_START
from .state import SceneState
from .world import N_FLOWS


def _flow_slots(flow: int):
    lo = FLOW0_START if flow == 0 else FLOW1_START
    hi = FLOW1_START if flow == 0 else C.N_VEHICLES
    return lo, hi


def spawn_flows(spec, state: SceneState, key) -> SceneState:
    """Distance-gap flow spawner (ActorFlow semantics, atomic_behaviors.py:2846).

    Each enabled flow decrements its gap budget by the distance its stream
    advanced this tick; at zero it claims a dead slot in its block and
    respawns at the polyline start with a fresh uniform gap.
    """
    veh = state.vehicles
    gaps = state.scenario.next_gap
    keys = jax.random.split(key, N_FLOWS)
    for flow in range(N_FLOWS):
        lo, hi = _flow_slots(flow)
        block = slice(lo, hi)
        enabled = spec.flow_enabled[flow]
        advanced = spec.flow_speed[flow] * C.DT
        gap = gaps[flow] - jnp.where(enabled, advanced, 0.0)
        # find a free slot in this flow's block
        free = ~veh.alive[block]
        has_free = jnp.any(free)
        slot = lo + jnp.argmax(free)
        do_spawn = enabled & (gap <= 0.0) & has_free
        new_gap = jnp.where(
            do_spawn,
            jax.random.uniform(keys[flow], (), minval=spec.flow_gap_lo[flow], maxval=spec.flow_gap_hi[flow]),
            gap,
        )
        start = spec.flow_xy[flow, 0]
        d0 = spec.flow_dir[flow, 0]
        kind = spec.flow_kind[flow]
        extent = jnp.where(kind == 1, jnp.asarray([0.9, 0.4]), jnp.asarray([2.4, 0.95]))

        def set_at(arr, val):
            return arr.at[slot].set(jnp.where(do_spawn, val, arr[slot]))

        veh = veh.replace(
            pos=veh.pos.at[slot].set(jnp.where(do_spawn, start, veh.pos[slot])),
            yaw=set_at(veh.yaw, jnp.arctan2(d0[1], d0[0])),
            speed=set_at(veh.speed, spec.flow_speed[flow]),
            target_speed=set_at(veh.target_speed, spec.flow_speed[flow]),
            alive=set_at(veh.alive, True),
            mode=set_at(veh.mode, 1),
            kind=set_at(veh.kind, kind),
            flow_s=set_at(veh.flow_s, 0.0),
            direction=set_at(veh.direction, 1.0),
            half_extent=veh.half_extent.at[slot].set(
                jnp.where(do_spawn, extent, veh.half_extent[slot])
            ),
            lane_offset=set_at(veh.lane_offset, 0.0),
            # recycled slot = physically new actor (collision-dedup identity)
            gen=set_at(veh.gen, veh.gen[slot] + 1),
        )
        gaps = gaps.at[flow].set(new_gap)
    return state.replace(vehicles=veh, scenario=state.scenario.replace(next_gap=gaps))


def _ego_s(state: SceneState) -> jnp.ndarray:
    return state.ego.route_idx.astype(jnp.float32)


def _activate_walkers(spec, state: SceneState, k: int) -> SceneState:
    """Release scenario slot k's walker window [walk_base, walk_base+walk_n)."""
    w = state.walkers
    n = w.pos.shape[0]
    idx = jnp.arange(n)
    newly = (idx >= spec.scen_walk_base[k]) & (idx < spec.scen_walk_base[k] + spec.scen_walk_n[k])
    return state.replace(
        walkers=w.replace(
            pos=jnp.where(newly[:, None], spec.walk_pos, w.pos),
            vel=jnp.where(newly[:, None], spec.walk_vel, w.vel),
            ttl=jnp.where(newly, spec.walk_ttl, w.ttl),
            alive=w.alive | newly,
        )
    )


def _noop(spec, state: SceneState, k: int) -> SceneState:
    return state


def _parking_cut_in(spec, state: SceneState, k: int) -> SceneState:
    """Parked car pulls out at 13 m/s when ego closes within 25 m of it."""
    s_cut = spec.scen_aux[k, 0]
    vb = spec.scen_veh_base[k]
    veh = state.vehicles
    trigger = (state.scenario.phase[k] == 0) & (_ego_s(state) >= s_cut - 25.0)
    phase = jnp.where(trigger, 1, state.scenario.phase[k])
    # on trigger: becomes a lane-follower starting at its parked arclength,
    # offset decays to lane center as it accelerates
    veh = veh.replace(
        mode=veh.mode.at[vb].set(jnp.where(trigger, 2, veh.mode[vb])),
        flow_s=veh.flow_s.at[vb].set(jnp.where(trigger, s_cut, veh.flow_s[vb])),
        lane_offset=veh.lane_offset.at[vb].set(
            jnp.where(
                state.scenario.phase[k] >= 1,
                jnp.maximum(veh.lane_offset[vb] - 2.0 * C.DT, 0.0),
                jnp.where(trigger, -C.LANE_WIDTH * 0.8, veh.lane_offset[vb]),
            )
        ),
        target_speed=veh.target_speed.at[vb].set(jnp.where(phase >= 1, 13.0, 0.0)),
    )
    return state.replace(vehicles=veh,
                         scenario=state.scenario.replace(phase=state.scenario.phase.at[k].set(phase)))


def _walker_crossing(spec, state: SceneState, k: int) -> SceneState:
    """DynamicObjectCrossing / PedestrianCrossing: release walkers when close."""
    s0 = spec.scen_aux[k, 0]
    trigger = (state.scenario.phase[k] == 0) & (_ego_s(state) >= s0 - 14.0)
    state = jax.lax.cond(jnp.any(trigger), lambda s: _activate_walkers(spec, s, k), lambda s: s, state)
    phase = jnp.where(trigger, 1, state.scenario.phase[k])
    return state.replace(scenario=state.scenario.replace(phase=state.scenario.phase.at[k].set(phase)))


def _blocked_intersection(spec, state: SceneState, k: int) -> SceneState:
    """Blocker waits; once ego is within 13 m, pauses 4 s then drives off."""
    sc = state.scenario
    vb = spec.scen_veh_base[k]
    close = jnp.linalg.norm(state.ego.pos - spec.scen_pos[k]) <= spec.scen_aux[k, 1]
    phase = jnp.where((sc.phase[k] == 0) & close, 1, sc.phase[k])
    go = (phase == 1) & (sc.timer[k] >= 4.0)
    phase = jnp.where(go, 2, phase)
    veh = state.vehicles
    veh = veh.replace(
        mode=veh.mode.at[vb].set(jnp.where(go, 2, veh.mode[vb])),
        flow_s=veh.flow_s.at[vb].set(jnp.where(go, spec.scen_aux[k, 0], veh.flow_s[vb])),
        target_speed=veh.target_speed.at[vb].set(jnp.where(phase == 2, 8.0, 0.0)),
    )
    return state.replace(vehicles=veh, scenario=sc.replace(phase=sc.phase.at[k].set(phase)))


def _hazard_side_lane(spec, state: SceneState, k: int) -> SceneState:
    """Two bicycles ride at the lane edge from the start; stop after bdist."""
    sc = state.scenario
    start = sc.phase[k] == 0
    veh = state.vehicles
    vb = spec.scen_veh_base[k]
    s0, bdist = spec.scen_aux[k, 0], spec.scen_aux[k, 1]
    for j in range(2):
        i = vb + j
        ride = start & veh.alive[i]
        veh = veh.replace(
            mode=veh.mode.at[i].set(jnp.where(ride, 2, veh.mode[i])),
            flow_s=veh.flow_s.at[i].set(jnp.where(ride, s0 + 8.0 * j, veh.flow_s[i])),
            lane_offset=veh.lane_offset.at[i].set(
                jnp.where(ride, -(0.55 * C.LANE_WIDTH / 2), veh.lane_offset[i])
            ),
            target_speed=veh.target_speed.at[i].set(
                jnp.where(veh.flow_s[i] - s0 > bdist, 0.0, veh.target_speed[i])
            ),
        )
    phase = jnp.where(start, 1, sc.phase[k])
    return state.replace(vehicles=veh, scenario=sc.replace(phase=sc.phase.at[k].set(phase)))


def _junction_adversary(spec, state: SceneState, k: int) -> SceneState:
    """OppositeVehicle* / VehicleTurningRoute*: when the ego nears the
    junction, the pre-placed adversary (slot veh_base) drives the crossing
    polyline (flow slot 0, one-shot — flow_enabled stays False so the spawner
    never touches it). The Pedestrian variant also releases its walker."""
    conflict_s = spec.scen_aux[k, 0]
    vb = spec.scen_veh_base[k]
    veh = state.vehicles
    trigger = (state.scenario.phase[k] == 0) & (_ego_s(state) >= conflict_s - 28.0)
    phase = jnp.where(trigger, 1, state.scenario.phase[k])
    veh = veh.replace(
        mode=veh.mode.at[vb].set(jnp.where(trigger, 1, veh.mode[vb])),
        flow_s=veh.flow_s.at[vb].set(jnp.where(trigger, 0.0, veh.flow_s[vb])),
        target_speed=veh.target_speed.at[vb].set(
            jnp.where(phase >= 1, spec.scen_aux[k, 1], 0.0)),
    )
    state = state.replace(vehicles=veh)
    has_walker = spec.scen_walk_n[k] > 0
    state = jax.lax.cond(jnp.any(trigger & has_walker),
                         lambda s: _activate_walkers(spec, s, k), lambda s: s, state)
    return state.replace(
        scenario=state.scenario.replace(phase=state.scenario.phase.at[k].set(phase)))


def _yield_emergency(spec, state: SceneState, k: int) -> SceneState:
    """YieldToEmergencyVehicle: an emergency vehicle spawns behind the ego at
    the trigger and closes fast; the ego must make room. scenario.aux
    accumulates the seconds the EV spends held up close behind the ego
    (YieldToEmergencyVehicleTest, atomic_criteria.py:2093 — judged in
    compute_score). Phase 2 = EV got past (success latch)."""
    sc = state.scenario
    veh = state.vehicles
    vb = spec.scen_veh_base[k]
    ego_s = _ego_s(state)
    trigger = (sc.phase[k] == 0) & (ego_s >= spec.scen_aux[k, 0])
    spawn_s = jnp.maximum(ego_s - spec.scen_aux[k, 1], 0.0)
    veh = veh.replace(
        pos=veh.pos.at[vb].set(jnp.where(trigger, spec.route_xy[spawn_s.astype(jnp.int32)], veh.pos[vb])),
        alive=veh.alive.at[vb].set(jnp.where(trigger, True, veh.alive[vb])),
        mode=veh.mode.at[vb].set(jnp.where(trigger, 2, veh.mode[vb])),
        flow_s=veh.flow_s.at[vb].set(jnp.where(trigger, spawn_s, veh.flow_s[vb])),
        lane_offset=veh.lane_offset.at[vb].set(jnp.where(trigger, 0.0, veh.lane_offset[vb])),
        direction=veh.direction.at[vb].set(jnp.where(trigger, 1.0, veh.direction[vb])),
        target_speed=veh.target_speed.at[vb].set(jnp.where(trigger, spec.scen_aux[k, 2], veh.target_speed[vb])),
        speed=veh.speed.at[vb].set(jnp.where(trigger, 8.0, veh.speed[vb])),
        half_extent=veh.half_extent.at[vb].set(
            jnp.where(trigger, jnp.asarray([2.4, 0.95]), veh.half_extent[vb])),
    )
    phase = jnp.where(trigger, 1, sc.phase[k])
    ev_s = veh.flow_s[vb]
    passed = (phase == 1) & veh.alive[vb] & (ev_s > ego_s + 6.0)
    phase = jnp.where(passed, 2, phase)
    # a laterally-yielding ego lets the EV pull around it on the left
    idx = state.ego.route_idx
    near = spec.route_xy[idx]
    d = spec.route_dir[idx]
    rel = state.ego.pos - near
    ego_lat = -(d[0] * rel[1] - d[1] * rel[0])  # + = driver's left
    overtaking = ((phase == 1) & veh.alive[vb] & (ego_lat < -1.2)
                  & (ev_s < ego_s + 4.0) & (ego_s - ev_s < 18.0))
    veh = veh.replace(lane_offset=veh.lane_offset.at[vb].set(
        jnp.where(overtaking, 1.8, jnp.where(passed, 0.0, veh.lane_offset[vb]))))
    # EV held up: close behind and forced below its desired speed
    held = ((phase == 1) & veh.alive[vb] & (ev_s < ego_s) & (ego_s - ev_s < 14.0)
            & (veh.speed[vb] < 0.6 * spec.scen_aux[k, 2]))
    aux = sc.aux[k] + jnp.where(held, C.DT, 0.0)
    return state.replace(vehicles=veh, scenario=sc.replace(
        phase=sc.phase.at[k].set(phase), aux=sc.aux.at[k].set(aux)))


def _hard_brake(spec, state: SceneState, k: int) -> SceneState:
    """HardBreakRoute: a lead vehicle materializes cruising ahead of the ego,
    then brakes hard for 4 s once the ego has closed in, then resumes."""
    sc = state.scenario
    veh = state.vehicles
    vb = spec.scen_veh_base[k]
    ego_s = _ego_s(state)
    trigger = (sc.phase[k] == 0) & (ego_s >= spec.scen_aux[k, 0] - 40.0)
    spawn_s = ego_s + 22.0
    veh = veh.replace(
        pos=veh.pos.at[vb].set(jnp.where(trigger, spec.route_xy[jnp.clip(spawn_s.astype(jnp.int32), 0, spec.route_xy.shape[0] - 1)], veh.pos[vb])),
        alive=veh.alive.at[vb].set(jnp.where(trigger, True, veh.alive[vb])),
        mode=veh.mode.at[vb].set(jnp.where(trigger, 2, veh.mode[vb])),
        flow_s=veh.flow_s.at[vb].set(jnp.where(trigger, spawn_s, veh.flow_s[vb])),
        direction=veh.direction.at[vb].set(jnp.where(trigger, 1.0, veh.direction[vb])),
        speed=veh.speed.at[vb].set(jnp.where(trigger, spec.scen_aux[k, 1], veh.speed[vb])),
        half_extent=veh.half_extent.at[vb].set(
            jnp.where(trigger, jnp.asarray([2.4, 0.95]), veh.half_extent[vb])),
    )
    phase = jnp.where(trigger, 1, sc.phase[k])
    close = (phase == 1) & veh.alive[vb] & (veh.flow_s[vb] - ego_s < 18.0) & (state.ego.speed > 3.0)
    phase = jnp.where(close, 2, phase)
    aux = jnp.where(close, sc.timer[k], sc.aux[k])  # brake-entry timestamp
    braking = (phase == 2) & (sc.timer[k] - aux < 4.0)
    resume = (phase == 2) & (sc.timer[k] - aux >= 4.0)
    phase = jnp.where(resume, 3, phase)
    target = jnp.where(braking, 0.0, jnp.where(phase >= 1, spec.scen_aux[k, 1], 0.0))
    veh = veh.replace(target_speed=veh.target_speed.at[vb].set(target))
    return state.replace(vehicles=veh, scenario=sc.replace(
        phase=sc.phase.at[k].set(phase), aux=sc.aux.at[k].set(aux)))


def _junction_wait(spec, state: SceneState, k: int) -> SceneState:
    """Junction crossing-flow family: negotiation wait clock.

    scenario.aux accumulates the seconds the ego has dwelt slowly just short
    of the flow crossing (scen_aux[0] = crossing arclength, set at build).
    Unlike criteria.blocked_time it does NOT reset when the ego starts
    moving — it clears only once the ego is through — so the expert's
    patience escalation (accept tighter gaps, then force entry and let the
    NPC yield handshake brake the flow) survives the launch itself. CARLA's
    TrafficManager negotiation is likewise stateful (SURVEY §2 TM row).
    """
    sc = state.scenario
    s_ego = _ego_s(state).astype(jnp.float32)
    cross_s = spec.scen_aux[k, 0]
    waiting = (s_ego > cross_s - 14.0) & (s_ego < cross_s - 3.0) & (state.ego.speed < 2.5)
    aux = jnp.where(waiting, sc.aux[k] + C.DT, sc.aux[k])
    aux = jnp.where(s_ego > cross_s + 2.0, 0.0, aux)
    return state.replace(scenario=sc.replace(aux=sc.aux.at[k].set(aux)))


def _control_loss(spec, state: SceneState, k: int) -> SceneState:
    """ControlLoss: ~1.5 s of steering disturbance at the trigger (the
    reference's AddNoiseToVehicle atoms, atomic_behaviors.py:1837-1963)."""
    sc = state.scenario
    trigger = (sc.phase[k] == 0) & (_ego_s(state) >= spec.scen_aux[k, 0])
    phase = jnp.where(trigger, 1, sc.phase[k])
    active = (phase == 1) & (sc.timer[k] < 1.5)
    phase = jnp.where((phase == 1) & (sc.timer[k] >= 1.5), 2, phase)
    ego = state.ego
    wobble = 0.35 * jnp.sin(sc.timer[k] * 8.0) * jnp.clip(ego.speed / 8.0, 0.0, 1.0)
    yaw = ego.yaw + jnp.where(active, wobble * C.DT * 8.0, 0.0)
    return state.replace(ego=ego.replace(yaw=yaw),
                         scenario=sc.replace(phase=sc.phase.at[k].set(phase)))


_BRANCHES = [
    _noop,  # 0 passive (layout/signals/criteria only)
    _parking_cut_in,  # 1 cut-in family
    _noop,  # 2 lane-obstacle family: statics (+ oncoming flow), no phases
    _walker_crossing,  # 3 blocker + crossing walker
    _junction_wait,  # 4 junction crossing-flow family: flow + wait clock
    _noop,  # 5 VehicleOpensDoorTwoWays: statics + oncoming flow
    _walker_crossing,  # 6 PedestrianCrossing
    _noop,  # 7 merge-into-flow family: flow-only
    _blocked_intersection,  # 8
    _hazard_side_lane,  # 9
    _junction_adversary,  # 10
    _yield_emergency,  # 11
    _hard_brake,  # 12
    _control_loss,  # 13
]


def scenario_step(spec, state: SceneState, key) -> SceneState:
    state = spawn_flows(spec, state, key)
    # one switch per scenario slot, unrolled over the static K (1 for every
    # bench2drive220 route — identical program to the single-machine step)
    for k in range(spec.scenario_type.shape[0]):
        branches = [functools.partial(b, k=k) for b in _BRANCHES]
        state = jax.lax.switch(spec.scenario_type[k], branches, spec, state)
    sc = state.scenario
    active = sc.phase >= 1
    timer = jnp.where(active, sc.timer + C.DT, sc.timer)
    timeout = jnp.where(active, sc.timeout - C.DT, sc.timeout)
    timed_out = sc.timed_out | (active & (timeout <= 0.0))
    return state.replace(scenario=sc.replace(timer=timer, timeout=timeout, timed_out=timed_out))
