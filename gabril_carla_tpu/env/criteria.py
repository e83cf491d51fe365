"""Route criteria + driving score as pure per-step reductions.

Parity targets (srunner scenarioatomics/atomic_criteria.py and leaderboard
utils/statistics_manager.py:21-37,349-416):
  RouteCompletionTest (waypoint advance, 99%/10 m completion rule),
  CollisionTest (per-category events with dedup window), OutsideRouteLanesTest
  (off-lane distance percentage), ActorBlockedTest (<0.1 m/s for 180 s),
  InRouteTest (30 m corridor), ScenarioTimeoutTest, and the score composition
  score_composed = max(route_completion% * product(penalties), 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import constants as C

from .state import SceneState, in_any_window

ROUTE_WINDOW = 20  # forward search window for ego localization (1 m points)


def localize_ego(spec, pos: jnp.ndarray, route_idx: jnp.ndarray):
    """Monotonic route tracker: nearest point in a forward window.

    Returns (new_idx, lateral_distance). Mirrors RouteCompletionTest's
    dot-product waypoint advance (atomic_criteria.py:1513) with a bounded
    window so it stays a static-shape gather under jit/vmap.
    """
    start = jnp.clip(route_idx, 0, spec.route_xy.shape[0] - ROUTE_WINDOW)
    win = jax.lax.dynamic_slice(spec.route_xy, (start, 0), (ROUTE_WINDOW, 2))
    d = jnp.linalg.norm(win - pos[None, :], axis=1)
    off = jnp.argmin(d)
    new_idx = jnp.minimum(start + off, spec.n_route - 1)
    return new_idx.astype(jnp.int32), d[off]


def _obb_overlap(pos_a, yaw_a, ext_a, pos_b, yaw_b, ext_b):
    """2D OBB overlap via the separating-axis test (4 axes)."""
    batch = jnp.broadcast_shapes(jnp.shape(yaw_a), jnp.shape(yaw_b))
    pos_a = jnp.broadcast_to(pos_a, batch + (2,))
    pos_b = jnp.broadcast_to(pos_b, batch + (2,))
    ext_a = jnp.broadcast_to(ext_a, batch + (2,))
    ext_b = jnp.broadcast_to(ext_b, batch + (2,))
    yaw_a = jnp.broadcast_to(yaw_a, batch)
    yaw_b = jnp.broadcast_to(yaw_b, batch)

    def axes(yaw):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        return jnp.stack([jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2)  # [..., 2, 2]

    ax_a, ax_b = axes(yaw_a), axes(yaw_b)
    allax = jnp.concatenate([ax_a, ax_b], axis=-2)  # [..., 4, 2]
    delta = pos_b - pos_a  # [..., 2]

    def project(ext, ax_own, axis):
        # half-projection of an OBB with half-extents ext onto axis
        return jnp.sum(ext[..., None, :] * jnp.abs(jnp.einsum("...kd,...ad->...ak", ax_own, axis)), -1)

    ra = project(ext_a, ax_a, allax)
    rb = project(ext_b, ax_b, allax)
    dist = jnp.abs(jnp.einsum("...d,...ad->...a", delta, allax))
    return jnp.all(dist <= ra + rb, axis=-1)


def criteria_step(spec, state: SceneState) -> SceneState:
    crit = state.criteria
    ego = state.ego
    new_idx, lat = localize_ego(spec, ego.pos, ego.route_idx)
    step_m = ego.speed * C.DT

    # --- OutsideRouteLanesTest: the reference runs two detectors and accrues
    # wrong-distance for either (atomic_criteria.py:1048-1051):
    #   (a) _is_outside_driving_lanes (:1106-1127) — farther than
    #       lane_width/2 + ALLOWED_OUT_DISTANCE (0.5 m, :996) from the
    #       nearest driving-lane center, i.e. off the road edge;
    #   (b) _is_at_wrong_lane (:1129-1160) — the nearest driving lane runs
    #       opposite the route (oncoming-lane invasion), suppressed inside
    #       junctions (:1138 "lanes and roads are too chaotic at junctions")
    #       and toggled off by TwoWays scenarios via the blackboard (:1043;
    #       our spec.lane_allow is that window in route arclength).
    # Our map model is the route lane + one oncoming lane + crossing-road
    # lanes (the scenario flow polylines), so both reduce to the signed
    # lateral offset from the route centerline plus a crossing-pavement test.
    s_here = new_idx.astype(jnp.float32)
    # one allow-window per scenario slot ([K, 2]); inside ANY of them counts
    in_allow = in_any_window(s_here, spec.lane_allow)
    tang = spec.route_dir[new_idx]
    delta_r = ego.pos - spec.route_xy[new_idx]
    # driver's-left normal in CARLA's y-south frame (world._left)
    signed_lat = delta_r[0] * tang[1] - delta_r[1] * tang[0]
    # junction pavement: within half a lane (+shoulder) of an enabled flow
    # polyline whose local direction crosses the route — the compiled
    # analogue of map.get_waypoint landing on a junction driving lane
    fd2 = jnp.sum((spec.flow_xy - ego.pos[None, None, :]) ** 2, axis=-1)  # [N_FLOWS, F]
    fmin = jnp.argmin(fd2, axis=-1)  # [N_FLOWS]
    fdist = jnp.sqrt(jnp.take_along_axis(fd2, fmin[:, None], 1)[:, 0])
    fdir = jnp.take_along_axis(spec.flow_dir, fmin[:, None, None], 1)[:, 0]  # [N_FLOWS, 2]
    is_crossing = jnp.abs(fdir @ tang) < 0.7  # >45 deg to the route
    on_junction = jnp.any(
        spec.flow_enabled & is_crossing
        & (fdist <= 0.5 * C.LANE_WIDTH + C.ALLOWED_OUT_DISTANCE)
    )
    wrong_lane = (
        (signed_lat > 0.5 * C.LANE_WIDTH) & ~in_allow & ~on_junction
    )
    off_road = (
        (signed_lat < -(0.5 * C.LANE_WIDTH + C.ALLOWED_OUT_DISTANCE))
        | (signed_lat > 1.5 * C.LANE_WIDTH + C.ALLOWED_OUT_DISTANCE)
    ) & ~on_junction
    outside = wrong_lane | off_road
    outside_m = crit.outside_lane_m + jnp.where(outside, step_m, 0.0)

    # --- collisions (ego OBB vs pools)
    ego_ext = jnp.asarray([C.EGO_HALF_LEN, C.EGO_HALF_WID])
    veh = state.vehicles
    hit_v = _obb_overlap(
        ego.pos, ego.yaw, ego_ext, veh.pos, veh.yaw, veh.half_extent
    ) & veh.alive
    st = state.statics
    hit_s = _obb_overlap(ego.pos, ego.yaw, ego_ext, st.pos, st.yaw, st.half_extent) & st.alive
    # walkers: ego OBB vs walker body circle — actual bbox contact, replacing
    # the old center-distance circle so a pedestrian standing half a metre
    # off the rear corner no longer scores the 0.5x penalty.
    wk = state.walkers
    rel = wk.pos - ego.pos[None, :]
    cy, sy = jnp.cos(ego.yaw), jnp.sin(ego.yaw)
    lx = rel[:, 0] * cy + rel[:, 1] * sy  # longitudinal in ego frame
    ly = -rel[:, 0] * sy + rel[:, 1] * cy
    gap_x = jnp.maximum(jnp.abs(lx) - C.EGO_HALF_LEN, 0.0)
    gap_y = jnp.maximum(jnp.abs(ly) - C.EGO_HALF_WID, 0.0)
    hit_w = (gap_x**2 + gap_y**2 < C.WALKER_RADIUS**2) & wk.alive

    # Dedup per CollisionTest._count_collisions (atomic_criteria.py:296-298,
    # 337-343, 374-384): (a) same actor id within MAX_ID_TIME counts once;
    # (b) any collision within COLLISION_RADIUS of the last event's location
    # counts once — the location filter clears, latched, when the ego moves
    # away; (c) collisions while the ego is ~stationary are not its fault.
    # Actor identity is the pool-slot index offset per pool.
    t_now = state.t.astype(jnp.float32) * C.DT
    nv, nw = hit_v.shape[0], hit_w.shape[0]
    vid = jnp.arange(nv, dtype=jnp.int32)
    wid = nv + jnp.arange(nw, dtype=jnp.int32)
    sid = nv + nw + jnp.arange(hit_s.shape[0], dtype=jnp.int32)
    id_active = (crit.last_collision_id >= 0) & (
        t_now - crit.last_collision_time <= C.COLLISION_MAX_ID_TIME
    )
    loc_valid = crit.collision_loc_valid & (
        jnp.linalg.norm(ego.pos - crit.last_collision_pos) <= C.COLLISION_RADIUS
    )
    blocked_all = loc_valid | (ego.speed < C.COLLISION_EPSILON)
    # identity = (slot id, spawn generation): a flow/ambient respawn recycling
    # the slot within MAX_ID_TIME is a NEW actor and must register (CARLA
    # actor ids never recycle; pool slots do). Walkers/statics never respawn
    # (gen 0 for life).
    same_gen_v = veh.gen == crit.last_collision_gen
    elig_v = hit_v & ~(id_active & (vid == crit.last_collision_id) & same_gen_v)
    elig_w = hit_w & ~(id_active & (wid == crit.last_collision_id)
                       & (crit.last_collision_gen == 0))
    elig_s = hit_s & ~(id_active & (sid == crit.last_collision_id)
                       & (crit.last_collision_gen == 0))
    any_v = jnp.any(elig_v) & ~blocked_all
    any_w = jnp.any(elig_w) & ~blocked_all & ~any_v
    any_s = jnp.any(elig_s) & ~blocked_all & ~any_v & ~any_w
    fired = any_v | any_w | any_s
    event_id = jnp.where(
        any_v, vid[jnp.argmax(elig_v)],
        jnp.where(any_w, wid[jnp.argmax(elig_w)], sid[jnp.argmax(elig_s)]),
    )
    event_gen = jnp.where(any_v, veh.gen[jnp.argmax(elig_v)], 0)
    new_id = jnp.where(fired, event_id, crit.last_collision_id)
    new_gen = jnp.where(fired, event_gen, crit.last_collision_gen)
    new_time = jnp.where(fired, t_now, crit.last_collision_time)
    new_last = jnp.where(fired, ego.pos, crit.last_collision_pos)
    new_loc_valid = jnp.where(fired, True, loc_valid)

    # --- blocked
    blocked_time = jnp.where(ego.speed < C.BLOCKED_SPEED, crit.blocked_time + C.DT, 0.0)
    blocked = crit.blocked | (blocked_time >= C.BLOCKED_SECONDS)

    # --- red light (derived-state FSM, traffic_lights.py)
    from .traffic_lights import red_light_crossing

    ran_red = red_light_crossing(
        spec.tl_stop_s, spec.tl_offset, spec.n_tl, ego.route_idx, new_idx,
        state.t.astype(jnp.float32) * C.DT,
        spec.tl_green_s, spec.tl_yellow_s, spec.tl_red_s,
    )

    # --- route deviation
    deviated = crit.deviated | (lat > C.IN_ROUTE_RADIUS)

    # --- stop signs: one full stop inside [stop_s-4, stop_s+5] satisfies
    # each sign (RunningStopTest semantics, atomic_criteria.py:1799: one
    # latched stop required per sign; leaving the zone without stopping
    # counts one infraction, once).
    s_ego = new_idx.astype(jnp.float32)
    sign_on = jnp.arange(spec.stop_s.shape[0]) < spec.n_stop
    in_zone = sign_on & (s_ego >= spec.stop_s - 4.0) & (s_ego <= spec.stop_s + 5.0)  # [K]
    stopped_now = ego.speed < C.BLOCKED_SPEED
    stop_done = crit.stop_done | (in_zone & stopped_now)
    pending = jnp.any(in_zone & ~stop_done)
    left_zone = sign_on & (s_ego > spec.stop_s + 5.0) & ~stop_done
    stop_inf = crit.stop_infraction + jnp.sum(left_zone.astype(jnp.int32))
    # leaving without stopping counts once; latch done so it doesn't re-fire
    stop_done = stop_done | left_zone

    # --- min speed vs ambient traffic, per route-quarter checkpoint
    # (MinimumSpeedRouteTest with checkpoints=4 on every route,
    # route_scenario.py:308; value = ego mean / background mean per
    # checkpoint, each failing checkpoint multiplies the penalty,
    # atomic_criteria.py:2040-2075 + statistics_manager 'decreases' rule)
    from .ambient import ambient_speeds

    amb_mean, has_amb = ambient_speeds(state.vehicles, spec)
    ego_sum = crit.ms_ego_sum + jnp.where(has_amb, ego.speed, 0.0)
    amb_sum = crit.ms_amb_sum + jnp.where(has_amb, amb_mean, 0.0)
    ticks = crit.ms_ticks + has_amb.astype(jnp.float32)
    cur_ck = jnp.clip(
        (4.0 * s_ego / jnp.maximum(spec.route_len, 1.0)).astype(jnp.int32), 0, 3
    )
    fold = cur_ck > crit.ms_ckpt
    ck_value = jnp.where(ticks > 0, 100.0 * ego_sum / jnp.maximum(amb_sum, 1e-6), 100.0)
    ck_factor = jnp.where(ck_value < 100.0,
                          1.0 - (1.0 - C.PENALTY_MIN_SPEED) * (1.0 - ck_value / 100.0), 1.0)
    ms_penalty = jnp.where(fold, crit.ms_penalty * ck_factor, crit.ms_penalty)
    ego_sum = jnp.where(fold, 0.0, ego_sum)
    amb_sum = jnp.where(fold, 0.0, amb_sum)
    ticks = jnp.where(fold, 0.0, ticks)

    crit = crit.replace(
        collisions_vehicle=crit.collisions_vehicle + any_v.astype(jnp.int32),
        collisions_pedestrian=crit.collisions_pedestrian + any_w.astype(jnp.int32),
        collisions_static=crit.collisions_static + any_s.astype(jnp.int32),
        last_collision_id=new_id,
        last_collision_gen=new_gen,
        last_collision_time=new_time,
        last_collision_pos=new_last,
        collision_loc_valid=new_loc_valid,
        outside_lane_m=outside_m,
        driven_m=crit.driven_m + step_m,
        ms_ego_sum=ego_sum, ms_amb_sum=amb_sum, ms_ticks=ticks,
        ms_ckpt=jnp.where(fold, cur_ck, crit.ms_ckpt),
        ms_penalty=ms_penalty,
        red_light=crit.red_light + ran_red.astype(jnp.int32),
        blocked_time=blocked_time,
        blocked=blocked,
        deviated=deviated,
        stop_pending=pending,
        stop_done=stop_done,
        stop_infraction=stop_inf,
    )
    return state.replace(ego=ego.replace(route_idx=new_idx), criteria=crit)


def completion_pct(spec, state: SceneState) -> jnp.ndarray:
    """Route completion % with the 99%/10 m goal rule."""
    pct = 100.0 * state.ego.route_idx.astype(jnp.float32) / jnp.maximum(spec.route_len, 1.0)
    goal = spec.route_xy[jnp.maximum(spec.n_route - 1, 0)]
    near_goal = jnp.linalg.norm(state.ego.pos - goal) <= C.COMPLETION_DIST
    return jnp.where((pct >= C.COMPLETION_PCT) & near_goal, 100.0, jnp.minimum(pct, 100.0))


def compute_score(spec, state: SceneState) -> dict:
    """score_composed = max(route% * product(penalties), 0)
    (statistics_manager.py:349-416)."""
    crit = state.criteria
    pct = completion_pct(spec, state)
    pf = jnp.float32
    # YieldToEmergencyVehicleTest (atomic_criteria.py:2093): infraction when
    # the ego held the emergency vehicle up for a sustained stretch
    # (scenario.aux accumulates EV-held seconds in scenarios._yield_emergency)
    ev_failed = jnp.any((spec.scenario_type == 11) & (state.scenario.aux > 8.0))
    penalty = (
        C.PENALTY_COLLISION_PEDESTRIAN ** pf(crit.collisions_pedestrian)
        * C.PENALTY_COLLISION_VEHICLE ** pf(crit.collisions_vehicle)
        * C.PENALTY_COLLISION_STATIC ** pf(crit.collisions_static)
        * C.PENALTY_RED_LIGHT ** pf(crit.red_light)
        * C.PENALTY_STOP_SIGN ** pf(crit.stop_infraction)
        # one 0.7x per timed-out scenario slot (ScenarioTimeoutTest fires
        # per scenario in the reference's route tree)
        * jnp.prod(jnp.where(state.scenario.timed_out, C.PENALTY_SCENARIO_TIMEOUT, 1.0))
        * jnp.where(ev_failed, C.PENALTY_YIELD_EMERGENCY, 1.0)
    )
    # OUTSIDE_ROUTE_LANES: 'increases' with value 0 -> *= (1 - pct_outside/100)
    pct_outside = 100.0 * crit.outside_lane_m / jnp.maximum(crit.driven_m, 1e-3)
    penalty = penalty * (1.0 - jnp.clip(pct_outside, 0.0, 100.0) / 100.0)
    # MIN_SPEED: 'decreases', per-unit 0.7, one event per failing checkpoint
    # (folded in criteria_step); the last open checkpoint folds here when the
    # route progressed past 95 % (MinimumSpeedRouteTest.terminate,
    # atomic_criteria.py:2080-2086).
    final_value = jnp.where(crit.ms_ticks > 0,
                            100.0 * crit.ms_ego_sum / jnp.maximum(crit.ms_amb_sum, 1e-6), 100.0)
    final_factor = jnp.where(
        (pct > 95.0) & (final_value < 100.0),
        1.0 - (1.0 - C.PENALTY_MIN_SPEED) * (1.0 - final_value / 100.0), 1.0)
    penalty = penalty * crit.ms_penalty * final_factor
    score = jnp.maximum(pct * penalty, 0.0)
    return {
        "score_route": pct,
        "score_penalty": penalty,
        "score_composed": score,
        "collisions_vehicle": crit.collisions_vehicle,
        "collisions_pedestrian": crit.collisions_pedestrian,
        "collisions_static": crit.collisions_static,
        "red_light": crit.red_light,
        "stop_infraction": crit.stop_infraction,
        "outside_route_lanes_pct": pct_outside,
        "min_speed_penalty": crit.ms_penalty * final_factor,
        # count, not any(): the penalty above multiplies 0.7 PER timed-out
        # slot, and stats.py emits one infraction message per event
        "scenario_timeout": jnp.sum(state.scenario.timed_out.astype(jnp.int32)),
        "yield_emergency": ev_failed,
        "blocked": crit.blocked,
        "deviated": crit.deviated,
    }
