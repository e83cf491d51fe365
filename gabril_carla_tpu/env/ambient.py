"""Ambient background traffic (BackgroundBehavior-lite).

The reference surrounds the ego with 'background'-role NPCs managed by a
2.4 kLoC py_trees engine (srunner/scenarios/background_activity.py:165+):
road traffic ahead/behind on the ego's road, opposite-lane traffic, and
junction traffic, remote-controlled by scenarios through blackboard atoms
(tools/background_manager.py:18-254 — LeaveSpaceInFront, RemoveRoadLane,
HandleJunctionScenario, ...).

TPU-native equivalent: a fixed block of lane-follow actor slots recycled
around the ego by pure masked updates —
  * same-direction slots [AMBIENT_SAME, AMBIENT_OPP) follow the route at
    lane offset 0 (ahead of and behind the ego),
  * opposite slots [AMBIENT_OPP, N_VEHICLES) run the adjacent lane toward
    the ego (direction -1, lane offset +LANE_WIDTH),
  * scenario keep-clear windows (WorldSpec.amb_clear / amb_opp_clear) are
    the mask-update analogue of the background-manager interventions:
    ambient actors inside the window despawn and none respawn there,
  * ambient vehicles hold at red/yellow traffic lights (the reference's
    TrafficManager light compliance), and despawn once far behind the ego,
    respawning ahead — constant-budget traffic without dynamic shapes.

These actors are also the measuring stick of the min-speed criterion
(MinimumSpeedRouteTest compares the ego's mean speed to the 'background'
vehicles' mean, atomic_criteria.py:2040-2056), so routes with ambient
traffic exercise that penalty exactly like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import constants as C
from .state import ActorPool, SceneState, in_any_window as _in_window
from .traffic_lights import GREEN, RED, light_state

AMBIENT_SAME = C.N_VEHICLES - C.N_AMBIENT_SAME - C.N_AMBIENT_OPP  # 16
AMBIENT_OPP = AMBIENT_SAME + C.N_AMBIENT_SAME  # 20

# initial placement relative to the ego spawn (meters of route arclength)
_SAME_INIT = jnp.asarray([-25.0, 30.0, 60.0, 90.0])
_OPP_INIT = jnp.asarray([40.0, 70.0, 100.0, 130.0])
CAR_EXTENT = jnp.asarray([2.4, 0.95])
BEHIND_DESPAWN = 60.0  # same-dir actors this far behind the ego recycle
OPP_BEHIND_DESPAWN = 15.0  # opposite traffic passes the ego and recycles


def ambient_reset(spec, vehicles: ActorPool) -> ActorPool:
    """Populate the ambient block at episode start."""
    ego_s = 0.0
    route_end = jnp.asarray(spec.n_route, jnp.float32) - 2.0

    def place(sl, s_init, direction, lane_offset, despawn_lo):
        n = s_init.shape[0]
        s = jnp.clip(ego_s + s_init, 0.0, route_end)
        win = spec.amb_clear if direction > 0 else spec.amb_opp_clear
        live = (
            jnp.broadcast_to(jnp.asarray(spec.amb_enabled), (n,))
            & (s > despawn_lo)
            & (s < route_end - 2.0)
            & ~_in_window(s, win)
        )
        if direction < 0:  # opposite lane must be geometrically valid here
            live = live & spec.opp_ok[jnp.clip(s.astype(jnp.int32), 0, spec.opp_ok.shape[0] - 1)]

        def pt(si):
            i = jnp.clip(si.astype(jnp.int32), 0, spec.route_xy.shape[0] - 2)
            return spec.route_xy[i], spec.route_dir[i]

        p, d = jax.vmap(pt)(s)
        p = p + lane_offset * jnp.stack([d[:, 1], -d[:, 0]], -1)  # +left normal
        yaw = jnp.arctan2(d[:, 1] * direction, d[:, 0] * direction)
        return s, p, yaw, live

    v = vehicles
    for sl, s_init, direction, off, lo in (
        (slice(AMBIENT_SAME, AMBIENT_OPP), _SAME_INIT, 1.0, 0.0, 1.0),
        (slice(AMBIENT_OPP, C.N_VEHICLES), _OPP_INIT, -1.0, C.LANE_WIDTH, 20.0),
    ):
        s, p, yaw, live = place(sl, s_init, direction, off, lo)
        n = s_init.shape[0]
        v = v.replace(
            pos=v.pos.at[sl].set(jnp.where(live[:, None], p, v.pos[sl])),
            yaw=v.yaw.at[sl].set(jnp.where(live, yaw, v.yaw[sl])),
            # spawn standing (the ego also cold-starts; background vehicles
            # accelerating from spawn is also the reference's behavior, and
            # a full-speed ambient fleet at t=0 would bias the first
            # MIN_SPEED checkpoint against the ego)
            speed=v.speed.at[sl].set(0.0),
            target_speed=v.target_speed.at[sl].set(jnp.where(live, spec.amb_speed, 0.0)),
            alive=v.alive.at[sl].set(live),
            mode=v.mode.at[sl].set(jnp.where(live, 2, 0)),
            kind=v.kind.at[sl].set(0),
            flow_s=v.flow_s.at[sl].set(jnp.where(live, s, 0.0)),
            lane_offset=v.lane_offset.at[sl].set(jnp.full((n,), off)),
            direction=v.direction.at[sl].set(jnp.full((n,), direction)),
            half_extent=v.half_extent.at[sl].set(
                jnp.where(live[:, None], CAR_EXTENT[None], v.half_extent[sl])
            ),
        )
    return v


def ambient_step(spec, state: SceneState, key) -> SceneState:
    """Recycle ambient actors around the ego + apply keep-clear windows."""
    v = state.vehicles
    ego_s = state.ego.route_idx.astype(jnp.float32)
    route_end = jnp.asarray(spec.n_route, jnp.float32) - 2.0
    t_s = state.t.astype(jnp.float32) * C.DT
    k_same, k_opp = jax.random.split(key)

    idx = jnp.arange(C.N_VEHICLES)
    is_same = (idx >= AMBIENT_SAME) & (idx < AMBIENT_OPP)
    is_opp = idx >= AMBIENT_OPP
    is_amb = is_same | is_opp

    # ---- clears + far-behind despawn + invalid opposite-lane segments
    in_clear = jnp.where(is_same, _in_window(v.flow_s, spec.amb_clear),
                         _in_window(v.flow_s, spec.amb_opp_clear))
    behind = jnp.where(is_same, ego_s - v.flow_s > BEHIND_DESPAWN,
                       ego_s - v.flow_s > OPP_BEHIND_DESPAWN)
    s_i = jnp.clip(v.flow_s.astype(jnp.int32), 0, spec.opp_ok.shape[0] - 1)
    bad_opp = is_opp & ~spec.opp_ok[s_i]
    kill = is_amb & v.alive & (in_clear | behind | bad_opp)
    alive = v.alive & ~kill

    # ---- light compliance for same-direction ambient: hold short of a
    # red/yellow stop line (CARLA TrafficManager parity, SURVEY §2)
    color = light_state(t_s, spec.tl_offset, spec.tl_green_s, spec.tl_yellow_s, spec.tl_red_s)
    tl_on = (jnp.arange(spec.tl_stop_s.shape[0]) < spec.n_tl) & (color != GREEN)
    gap = spec.tl_stop_s[None, :] - v.flow_s[:, None]  # [N, K]
    hold = jnp.any(tl_on[None, :] & (gap > 0.5) & (gap < 8.0), axis=1) & is_same
    target = jnp.where(is_amb & alive, jnp.where(hold, 0.0, spec.amb_speed), v.target_speed)
    target = jnp.where(is_amb & ~alive, 0.0, target)

    # ---- ambient JUNCTION crossing traffic (flow slot 0 when jct_flow,
    # BackgroundBehavior's junction sources, background_activity.py:165+):
    # hold short of the ego corridor while the ego's light is green (the
    # crossing road then has red), or — unsignalized — while the ego is
    # at/approaching the junction. Actors already past the hold line clear
    # the junction; npc_collision_avoidance stays the safety net.
    from .dynamics import FLOW0_START, FLOW1_START

    is_jf = (idx >= FLOW0_START) & (idx < FLOW1_START) & jnp.asarray(spec.jct_flow)
    sig = jnp.asarray(spec.jct_signal)
    col_sig = color[jnp.clip(sig, 0, color.shape[0] - 1)]
    # unsignalized: yield to a MOVING or very-close ego; an ego legally
    # stopped short of the junction (stop sign, queue) does not dam the
    # crossing road — its traffic flows in front, as in CARLA
    ego_near = (ego_s > spec.jct_cross_s - 35.0) & (ego_s < spec.jct_cross_s + 6.0)
    ego_close = jnp.abs(ego_s - spec.jct_cross_s) < 12.0
    ego_threat = ego_near & ((state.ego.speed > 1.0) | ego_close)
    # crossers stay blocked through the ego's YELLOW too: in real phasing
    # (and CARLA) the crossing road holds red until the ego road reaches RED,
    # so an ego that legally entered on yellow never meets released crossers
    blocked = jnp.where(sig >= 0, col_sig != RED, ego_threat)
    at_hold = (v.flow_s < spec.jct_hold_s) & (v.flow_s > spec.jct_hold_s - 14.0)
    # recompute (don't latch): a held actor resumes at flow speed the tick
    # its block clears
    jf_target = jnp.where(at_hold & blocked, 0.0, spec.flow_speed[0])
    target = jnp.where(is_jf & v.alive, jf_target, target)

    # ---- respawn dead ambient slots ahead of the ego (one per direction per
    # tick keeps spawns staggered without per-slot RNG state)
    def respawn(vv, tgt, alv, block_lo, block_hi, direction, off, rkey):
        free = (idx >= block_lo) & (idx < block_hi) & ~alv
        has_free = jnp.any(free)
        slot = jnp.argmax(free)
        s_new = ego_s + jax.random.uniform(rkey, (), minval=65.0, maxval=140.0)
        wspec = spec.amb_clear if direction > 0 else spec.amb_opp_clear
        ok = (
            jnp.asarray(spec.amb_enabled)
            & has_free
            & (s_new < route_end - 5.0)
            & ~_in_window(s_new, wspec)
        )
        if direction < 0:
            ok = ok & spec.opp_ok[jnp.clip(s_new.astype(jnp.int32), 0, spec.opp_ok.shape[0] - 1)]
        # don't drop a car onto an existing one
        i0 = jnp.clip(s_new.astype(jnp.int32), 0, spec.route_xy.shape[0] - 2)
        p = spec.route_xy[i0] + off * jnp.stack([spec.route_dir[i0, 1], -spec.route_dir[i0, 0]])
        d = spec.route_dir[i0]
        clear_of_actors = jnp.min(
            jnp.where(alv, jnp.linalg.norm(vv.pos - p[None], axis=1), jnp.inf)
        ) > 12.0
        ok = ok & clear_of_actors

        def set1(arr, val):
            return arr.at[slot].set(jnp.where(ok, val, arr[slot]))

        vv = vv.replace(
            pos=vv.pos.at[slot].set(jnp.where(ok, p, vv.pos[slot])),
            yaw=set1(vv.yaw, jnp.arctan2(d[1] * direction, d[0] * direction)),
            speed=set1(vv.speed, spec.amb_speed),
            alive=set1(vv.alive, True),
            mode=set1(vv.mode, 2),
            kind=set1(vv.kind, 0),
            flow_s=set1(vv.flow_s, s_new),
            lane_offset=set1(vv.lane_offset, off),
            direction=set1(vv.direction, direction),
            half_extent=vv.half_extent.at[slot].set(
                jnp.where(ok, CAR_EXTENT, vv.half_extent[slot])
            ),
            # recycled slot = physically new actor (collision-dedup identity)
            gen=set1(vv.gen, vv.gen[slot] + 1),
        )
        tgt = tgt.at[slot].set(jnp.where(ok, spec.amb_speed, tgt[slot]))
        return vv, tgt

    v = v.replace(alive=alive, target_speed=target)
    v, target2 = respawn(v, v.target_speed, v.alive, AMBIENT_SAME, AMBIENT_OPP, 1.0, 0.0, k_same)
    v = v.replace(target_speed=target2)
    v, target3 = respawn(v, v.target_speed, v.alive, AMBIENT_OPP, C.N_VEHICLES, -1.0,
                         C.LANE_WIDTH, k_opp)
    v = v.replace(target_speed=target3)
    return state.replace(vehicles=v)


def ambient_speeds(vehicles: ActorPool, spec=None):
    """(mean speed of alive ambient actors, any alive) — the background
    reference speed of MinimumSpeedRouteTest (atomic_criteria.py:2040-2056).

    With ``spec`` given, junction crossing traffic (flow slot 0 under
    jct_flow) counts as background too — in the reference those are
    'background'-role actors (background_activity.py junction sources)."""
    idx = jnp.arange(C.N_VEHICLES)
    amb = idx >= AMBIENT_SAME
    if spec is not None:
        from .dynamics import FLOW0_START, FLOW1_START

        amb = amb | (jnp.asarray(spec.jct_flow)
                     & (idx >= FLOW0_START) & (idx < FLOW1_START))
    alive = vehicles.alive & amb
    n = jnp.sum(alive.astype(jnp.float32))
    mean = jnp.sum(jnp.where(alive, vehicles.speed, 0.0)) / jnp.maximum(n, 1.0)
    return mean, n > 0
