"""Privileged scripted expert: pure pursuit + hazard yielding + overtaking.

Stands in for the reference's human demonstrator / TrafficManager autopilot
(eval/my_agents/human_agent.py collects human driving; CARLA's TM drives
NPCs). Stateless pure function of (WorldSpec, SceneState): overtake decisions
are derived from scene geometry every tick, so collection rolls out in-graph
at full vmapped throughput. Handles the benchmark's scenario families:
corridor braking, crossing-flow yield (CrossingBicycleFlow/Merger), walker
yield (DynamicObjectCrossing/PedestrianCrossing), stop-sign compliance, and
opposite-lane overtakes around static obstructions (AccidentTwoWays /
VehicleOpensDoorTwoWays / HazardAtSideLane / ParkingCutIn).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import constants as C
from .dynamics import left_normal, polyline_point
from .state import SceneState, in_any_window

CRUISE_SPEED = 9.0  # m/s — above the 7.0 ambient cruise so stops and turns do
# not drag the MinimumSpeedRouteTest ratio below 100% (drive with the traffic)

# Corridor must be shorter than BlockedIntersection's 13 m scenario trigger
# (blocked_intersection.py:64) or the ego parks outside it and deadlocks.
HAZARD_AHEAD = 11.0
HAZARD_HALF_WIDTH = 1.5
ROUTE_WIN = 48  # forward window for obstacle route-projection (1 m points)


def _route_frame(spec, pts, ego_idx):
    """Project points onto the route near the ego: (s, signed_left, ok)."""
    start = jnp.clip(ego_idx - 8, 0, spec.route_xy.shape[0] - ROUTE_WIN)
    import jax

    win = jax.lax.dynamic_slice(spec.route_xy, (start, 0), (ROUTE_WIN, 2))
    wdir = jax.lax.dynamic_slice(spec.route_dir, (start, 0), (ROUTE_WIN, 2))
    d2 = jnp.sum((pts[:, None, :] - win[None, :, :]) ** 2, axis=-1)  # [N, W]
    j = jnp.argmin(d2, axis=1)
    near, nd = win[j], wdir[j]
    rel = pts - near
    s = (start + j).astype(jnp.float32)
    lat = -(nd[:, 0] * rel[:, 1] - nd[:, 1] * rel[:, 0])  # +left
    ok = jnp.sqrt(jnp.min(d2, axis=1)) < 8.0
    return s, lat, ok


def expert_action(spec, state: SceneState) -> jnp.ndarray:
    """7-vector control (autonomous_agent.py codec) from privileged state."""
    ego = state.ego
    s_ego = ego.route_idx.astype(jnp.float32)
    heading = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)])
    left = left_normal(heading)

    veh, wk, st = state.vehicles, state.walkers, state.statics

    # ---------- obstructions in my lane -> overtake plan
    # "static-like" = parked/stopped scenery, not a lane-follower pulling away
    static_veh = veh.alive & (veh.speed < 0.5) & (veh.target_speed < 0.5)
    obs_pos = jnp.concatenate([veh.pos, st.pos])
    obs_alive = jnp.concatenate([static_veh, st.alive])
    obs_s, obs_lat, obs_ok = _route_frame(spec, obs_pos, ego.route_idx)
    in_my_lane = obs_alive & obs_ok & (jnp.abs(obs_lat) < 2.1)
    ahead = in_my_lane & (obs_s > s_ego - 4.0) & (obs_s < s_ego + 28.0)
    blocker_s = jnp.min(jnp.where(ahead, obs_s, jnp.inf))
    blocker_end = jnp.max(jnp.where(ahead, obs_s, -jnp.inf))
    has_blocker = jnp.isfinite(blocker_s)
    # overtakes only where the scenario legitimizes the opposite lane
    # (TwoWays families) AND the blocker sits inside that slot's own
    # lane-allow window — a blocker owned by a different slot on the same
    # route (e.g. BlockedIntersection) must be waited out, not passed
    stype = spec.scenario_type  # [K] scenario slots per route
    twoways = (stype == 2) | (stype == 5) | (stype == 9)
    tw_windows = jnp.where(twoways[:, None], spec.lane_allow, 0.0)  # [K, 2]
    overtake_scenario = in_any_window(blocker_s, tw_windows)
    # overtake window: approach 10 m before the first blocker, return 8 m after
    in_overtake = (
        overtake_scenario & has_blocker
        & (s_ego > blocker_s - 12.0) & (s_ego < blocker_end + 8.0)
    )

    # oncoming traffic in the opposite lane blocks the overtake. The window
    # must cover the whole pass: entering with a car 40 m out leaves the ego
    # stranded head-on mid-pass (a full pass takes ~6 s; closing speed is
    # ~13 m/s), so look ~80 m ahead before committing.
    onc_s, onc_lat, onc_ok = _route_frame(spec, veh.pos, ego.route_idx)
    oncoming = (
        veh.alive & onc_ok & (veh.speed > 0.5)
        & (onc_lat > 1.2) & (onc_lat < 5.8)
        & (onc_s > s_ego - 4.0) & (onc_s < s_ego + 80.0)
    )
    oncoming_busy = jnp.any(oncoming)
    # committed once we're already in the opposite lane: finish the pass
    _, ego_lat_arr, _ = _route_frame(spec, ego.pos[None], ego.route_idx)
    ego_lat = ego_lat_arr[0]
    committed = ego_lat > 1.2
    do_overtake = in_overtake & (~oncoming_busy | committed)
    wait_for_gap = in_overtake & oncoming_busy & ~committed & (s_ego > blocker_s - 13.0)

    target_offset = jnp.where(do_overtake, C.LANE_WIDTH, 0.0)

    # ---------- emergency vehicle behind (YieldToEmergencyVehicle): pull
    # toward the right lane edge and slow until it has passed
    # the EV rides its scenario slot's scripted-vehicle base (one EV
    # scenario per route; with none, the mask is all-False and evb is moot)
    evb = spec.scen_veh_base[jnp.argmax(stype == 11)]
    ev_rel = veh.pos[evb] - ego.pos
    ev_yield = (
        jnp.any(stype == 11) & veh.alive[evb] & (veh.mode[evb] == 2)
        & ((ev_rel @ heading) < 3.0) & (jnp.linalg.norm(ev_rel) < 32.0)
    )
    target_offset = jnp.where(ev_yield, -1.9, target_offset)

    # ---------- pure pursuit toward offset route point
    # short lookahead: long previews cut curves into the oncoming lane
    lookahead = 2.5 + 0.45 * ego.speed
    tgt, tdir = polyline_point(spec.route_xy, spec.route_dir, s_ego + lookahead, spec.n_route)
    tgt = tgt + target_offset * left_normal(tdir)
    rel = tgt - ego.pos
    fwd_dist = jnp.maximum(rel @ heading, 0.5)
    alpha = jnp.arctan2(rel @ left, fwd_dist)  # >0: target on the driver's left
    delta = jnp.arctan2(2.0 * C.EGO_WHEELBASE * jnp.sin(alpha), jnp.maximum(lookahead, 1.0))
    # positive steer turns toward the driver's right (ego_step yaw convention)
    steer = jnp.clip(-delta / jnp.deg2rad(C.EGO_MAX_STEER_DEG), -1.0, 1.0)

    # ---------- curvature-aware target speed
    _, d0 = polyline_point(spec.route_xy, spec.route_dir, s_ego + 2.0, spec.n_route)
    _, d1 = polyline_point(spec.route_xy, spec.route_dir, s_ego + 8.0, spec.n_route)
    _, d2 = polyline_point(spec.route_xy, spec.route_dir, s_ego + 16.0, spec.n_route)
    turn = jnp.maximum(1.0 - jnp.abs(d1 @ d2), 1.0 - jnp.abs(d0 @ d1))
    v_target = CRUISE_SPEED * (1.0 - jnp.clip(6.0 * turn, 0.0, 0.8))
    v_target = jnp.where(do_overtake, jnp.minimum(v_target, 6.0), v_target)
    v_target = jnp.where(ev_yield, jnp.minimum(v_target, 2.5), v_target)

    # ---------- corridor braking (center shifted when overtaking)
    def corridor_hit(pos, alive, half_w, length):
        rel = pos - ego.pos[None]
        f = rel @ heading
        l = rel @ left - ego.steer * 0.0  # corridor along current heading
        return jnp.any(alive & (f > 0.0) & (f < length) & (jnp.abs(l - target_offset * 0.5) < half_w))

    moving_veh = veh.alive & (veh.speed >= 0.5)
    vdir = jnp.stack([jnp.cos(veh.yaw), jnp.sin(veh.yaw)], -1)
    same_dir = (vdir @ heading) > 0.7
    # same-direction leader: gap-keeping follower (match the lead's speed at
    # ~9 m so the ego keeps pace with ambient traffic — falling behind costs
    # MIN_SPEED checkpoints, atomic_criteria.py:2040-2075)
    relv = veh.pos - ego.pos[None]
    fv = relv @ heading
    lv = relv @ left
    lead = moving_veh & same_dir & (fv > 0.0) & (fv < 20.0) & (jnp.abs(lv - target_offset * 0.5) < 2.0)
    lead_i = jnp.argmin(jnp.where(lead, fv, jnp.inf))
    has_lead = jnp.any(lead)
    follow = jnp.maximum(veh.speed[lead_i] + 0.4 * (fv[lead_i] - 9.0), 0.0)
    v_target = jnp.where(has_lead, jnp.minimum(v_target, follow), v_target)
    close_lead = jnp.any(lead & (fv < 6.0))

    # opposing/crossing movers close fast — longer corridor than for statics;
    # kept separate so a committed junction crossing doesn't brake mid-lane
    # (stopping inside the crossing lane is what gets the ego T-boned).
    # Oncoming traffic IN the opposite lane is not a crossing hazard while
    # the ego keeps to its own lane — on curves the heading-based corridor
    # sweeps across the opposite lane and a false stop at the apex parks the
    # ego right where the oncoming car's swept path passes (observed on
    # route 24759).
    # ... and never for oncoming cars during a committed pass: stopping dead
    # in the opposite lane turns a near-miss into a head-on (observed on
    # route 24258); finishing the pass is the only way out, and the NPCs'
    # committed-ego avoidance brakes them meanwhile.
    in_opposite_lane = veh.alive & onc_ok & (onc_lat > 1.2) & (onc_lat < 5.8)
    ego_in_own_lane = jnp.abs(ego_lat) < 1.2
    cross_threat = moving_veh & ~same_dir & ~(in_opposite_lane & (ego_in_own_lane | do_overtake))
    cross_hazard = corridor_hit(veh.pos, cross_threat, 2.2, 15.0)
    # ParkingExit (scen_aux[3] marker): the ego starts inside a parked row;
    # the hemming statics sit dead ahead in the heading corridor, so treating
    # them as hazards deadlocks the pull-out — steering clears them.
    parking_exit = jnp.any((stype == 0) & (spec.scen_aux[:, 3] > 0.5)) & (s_ego < 18.0)
    hazard = close_lead
    hazard |= corridor_hit(st.pos, st.alive & ~do_overtake & ~parking_exit,
                           HAZARD_HALF_WIDTH, HAZARD_AHEAD)
    hazard |= corridor_hit(veh.pos, veh.alive & ~moving_veh & ~do_overtake,
                           HAZARD_HALF_WIDTH, HAZARD_AHEAD)

    # ---------- crossing-flow stop line (CrossingBicycleFlow / junctions):
    # find where the scenario flow polyline crosses the route ahead and stop
    # short of it while the flow is busy — stopping ON the line gets the ego
    # T-boned repeatedly.
    import jax

    start = jnp.clip(ego.route_idx - 8, 0, spec.route_xy.shape[0] - ROUTE_WIN)
    rwin = jax.lax.dynamic_slice(spec.route_xy, (start, 0), (ROUTE_WIN, 2))
    fxy = spec.flow_xy[0]
    dd = jnp.sum((rwin[:, None, :] - fxy[None, :, :]) ** 2, axis=-1)  # [W, F]
    per_pt = jnp.sqrt(jnp.min(dd, axis=1))
    cross_off = jnp.argmin(per_pt)
    cross_s = (start + cross_off).astype(jnp.float32)
    crosses = spec.flow_enabled[0] & (per_pt[cross_off] < 3.0)
    cross_pt = rwin[cross_off]
    # gap acceptance by time-to-arrival: a crosser within ~1.6 s blocks entry;
    # anything further is a usable gap — NPC collision avoidance
    # (TrafficManager parity) brakes crossers for an ego already in the
    # junction, so assertive entry is both safe and human-like. The hold zone
    # ends 6 m short of the crossing: the ego is ~2.5 m nose-forward of its
    # center, and parking closer leaves the nose inside the crossing lane
    # (observed: stationary ego clipped by the flow on route 3099).
    to_cross = cross_pt[None] - veh.pos
    closing_cross = jnp.sum(to_cross * vdir, axis=1)  # + if heading toward it
    flow = veh.alive & (veh.mode == 1)
    # gap acceptance: a crosser arriving within ~1.9 s blocks entry (the ego
    # needs ~1.7 s to push its nose through the crossing lane from the hold
    # line; round-2's 1.2 s horizon committed into bikes one second out).
    # PATIENCE: dense flows (12-25 m gaps ~ 1-2 s headways) may never open a
    # 1.9 s gap — a human waits a few seconds, then accepts a tighter gap,
    # then nudges in and forces the flow to yield (TrafficManager negotiation;
    # the NPC swept-path anticipation in dynamics.py brakes crossers ~2.4 s
    # out for a committed ego). scenario.aux is the junction wait clock
    # (scenarios._junction_wait): latched through the launch, cleared only
    # once the ego is through the crossing.
    waited = jnp.sum(jnp.where(stype == 4, state.scenario.aux, 0.0))
    # escalating patience: 1.9 s -> 1.2 s -> 0.9 s. Never below 0.9 s: a
    # 12 m/s bike needs v^2/(2*9) = 8 m to stop, so launching inside its
    # stopping distance is a guaranteed hit no matter who yields.
    horizon = jnp.where(waited > 10.0, 0.9, jnp.where(waited > 5.0, 1.2, 1.9))
    # only crossers arriving inside the CONFLICT window block: one arriving
    # within ~0.55 s has vacated the crossing before the ego's nose (≥1 s
    # away from the hold line) gets there — launching right behind a passing
    # bike is how humans beat dense flows (5-26 m headways on route 3099)
    arr = closing_cross / jnp.maximum(veh.speed, 1.0)
    imminent = flow & (arr > 0.75) & (arr < horizon)
    # a SLOW flow actor inside the junction blocks entry (it is recovering
    # from its own yield and will accelerate); fast ones are handled by the
    # time-to-arrival gap — treating any occupancy as busy deadlocks on
    # dense flows (12-25 m gaps keep an 8 m box occupied near-permanently)
    in_box = flow & (veh.speed < 2.0) & (jnp.linalg.norm(veh.pos - cross_pt[None], axis=1) < 8.0)
    flow_busy = jnp.any(imminent | in_box)
    yield_cross = crosses & flow_busy & (s_ego > cross_s - 12.0) & (s_ego < cross_s - 6.0)
    # creep guard: the hold line is soft (braking from the zone edge leaves
    # momentum), so an ego that drifted just past it, slow, with the flow
    # busy, must stop NOW — limping into the crossing at 2 m/s maximizes
    # exposure (the round-3 3100 trace: every collision was a v~2 entry).
    # Past cross_s-4.5 the nose is already in the lane: committing is safer.
    yield_cross |= (
        crosses & flow_busy & (s_ego >= cross_s - 6.0) & (s_ego < cross_s - 4.5)
        & (ego.speed < 3.5)
    )
    # once committed, clear the junction briskly (minimum exposure time) and
    # don't brake for crossers mid-lane — their TrafficManager-parity
    # collision avoidance yields to a vehicle already in the junction
    in_junction = crosses & (s_ego >= cross_s - 6.0) & (s_ego <= cross_s + 6.0) & ~yield_cross
    v_target = jnp.where(in_junction, jnp.maximum(v_target, CRUISE_SPEED), v_target)
    hazard = hazard | (cross_hazard & ~in_junction)

    # walkers: generous yield box
    relw = wk.pos - ego.pos[None]
    fw = relw @ heading
    lw_ = relw @ left
    closing_w = (lw_ * (wk.vel @ left)) < 0.0
    yield_walk = jnp.any(wk.alive & (fw > -1.0) & (fw < 13.0) & (jnp.abs(lw_) < 5.0) & (closing_w | (jnp.abs(lw_) < 2.0)))

    # ---------- stop signs: brake in each zone until that stop has latched
    sign_on = jnp.arange(spec.stop_s.shape[0]) < spec.n_stop
    in_zone = sign_on & (s_ego >= spec.stop_s - 4.0) & (s_ego <= spec.stop_s + 4.0)
    must_stop = jnp.any(in_zone & ~state.criteria.stop_done)

    # ---------- traffic lights: hold short of the stop line unless green
    # (red_light_crossing fires when entering on red, traffic_lights.py)
    from .traffic_lights import GREEN, light_state

    t_s = state.t.astype(jnp.float32) * C.DT
    tl_on = jnp.arange(spec.tl_stop_s.shape[0]) < spec.n_tl
    tl_color = light_state(t_s, spec.tl_offset, spec.tl_green_s, spec.tl_yellow_s, spec.tl_red_s)
    approaching = tl_on & (s_ego >= spec.tl_stop_s - 9.0) & (s_ego <= spec.tl_stop_s - 1.0)
    hold_light = jnp.any(approaching & (tl_color != GREEN))

    brake_on = hazard | yield_cross | yield_walk | must_stop | hold_light | wait_for_gap
    # commit hard through a junction crossing: exposure time is the risk.
    # Launching from the hold line after a wait gets the same full throttle —
    # a slow roll-in maximizes the time spent inside the crossing lane.
    launching = crosses & (waited > 0.5) & (s_ego > cross_s - 12.0) & (s_ego < cross_s + 6.0)
    # full throttle when well below target (pulling away from stops) — cruise
    # trim stays at 0.75. Sluggish pull-aways are pure MIN_SPEED deadweight.
    pulling_away = (v_target - ego.speed) > 3.0
    throttle_cap = jnp.where(in_junction | launching | pulling_away, 1.0, 0.75)
    v_target = jnp.where(launching & ~brake_on, jnp.maximum(v_target, CRUISE_SPEED), v_target)
    throttle = jnp.clip(0.5 * (v_target - ego.speed), 0.0, throttle_cap)
    throttle = jnp.where(brake_on, 0.0, throttle)
    brake = jnp.where(brake_on, 1.0, 0.0)
    return jnp.stack([throttle, steer, brake, 0.0, 0.0, 0.0, 0.0])
