"""Vehicle/walker dynamics: kinematic bicycle ego + polyline-following NPCs.

Replaces the CARLA server's PhysX vehicle simulation with a 20 Hz kinematic
bicycle model (the reference's control contract is the 7-vector codec at
eval/my_agents/autonomous_agent.py:169-206: throttle/steer in [0,1]/[-1,1],
brake binarized). NPC motion replaces the TrafficManager's lane following:
everything advances by arclength along precompiled polylines — pure gathers
and FMAs, vmap-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import constants as C
from .state import ActorPool, EgoState, WalkerPool


def ego_step(ego: EgoState, throttle, steer, brake, dt: float = C.DT) -> EgoState:
    """Kinematic bicycle with throttle/brake force model."""
    throttle = jnp.clip(throttle, 0.0, 1.0)
    steer = jnp.clip(steer, -1.0, 1.0)
    accel = throttle * C.EGO_MAX_ACCEL - brake * C.EGO_MAX_BRAKE - C.EGO_DRAG * ego.speed
    speed = jnp.clip(ego.speed + accel * dt, 0.0, C.EGO_MAX_SPEED)
    delta = steer * jnp.deg2rad(C.EGO_MAX_STEER_DEG)
    yaw = ego.yaw + speed / C.EGO_WHEELBASE * jnp.tan(delta) * dt
    heading = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
    pos = ego.pos + speed * heading * dt
    return ego.replace(pos=pos, yaw=yaw, speed=speed, steer=steer)


def polyline_point(xy: jnp.ndarray, dirs: jnp.ndarray, s: jnp.ndarray, n_valid):
    """Position + tangent at arclength s on a 1 m-spaced polyline [M, 2]."""
    s = jnp.clip(s, 0.0, jnp.asarray(n_valid, jnp.float32) - 1.0)
    i0 = jnp.clip(s.astype(jnp.int32), 0, xy.shape[0] - 2)
    frac = (s - i0.astype(jnp.float32))[..., None]
    p = xy[i0] * (1 - frac) + xy[i0 + 1] * frac
    d = dirs[i0]
    return p, d


def left_normal(d: jnp.ndarray) -> jnp.ndarray:
    """Driver's-left unit normal in CARLA's y-south frame."""
    return jnp.stack([d[..., 1], -d[..., 0]], axis=-1)


def npc_collision_avoidance(pool: ActorPool, ego_pos, ego_yaw, ego_speed=0.0,
                            dt: float = C.DT):
    """TrafficManager-style lead-vehicle braking for NPCs.

    CARLA's TM brakes NPCs for obstacles ahead (SURVEY §2: TrafficManager
    'NPC lane-following, lights/sign compliance'); without it, flows T-bone a
    stopped ego forever. Returns a per-NPC speed cap.
    """
    n = pool.pos.shape[0]
    hdg = jnp.stack([jnp.cos(pool.yaw), jnp.sin(pool.yaw)], -1)  # [N, 2]
    # braking-distance-aware lookahead: v^2 / (2 * 4.5) + margin
    look = 4.0 + pool.speed**2 / 9.0  # [N]
    # vs ego. Two regimes, mirroring how CARLA's TM negotiates with the hero:
    #  * ego COMMITTED (moving): NPCs yield early and wide, including against
    #    the ~1 s-extrapolated ego position — a crossing ego enters an NPC's
    #    lane late (perpendicular geometry: observed lateral 4.5 m -> 2.9 m
    #    while range closed 16 m -> 3 m), so NPCs react to where it WILL be.
    #  * ego waiting/slow: only an imminent overlap brakes the NPC — else
    #    flows stall next to a yielding ego and the junction deadlocks.
    ego_fwd = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])

    def blocked_by(p, f_scale, lat):
        rel_e = p[None] - pool.pos
        f_e = jnp.sum(rel_e * hdg, -1)
        l_e = rel_e[:, 0] * hdg[:, 1] - rel_e[:, 1] * hdg[:, 0]
        return (f_e > 0.0) & (f_e < f_scale * look) & (jnp.abs(l_e) < lat)

    committed = ego_speed > 1.5
    # swept-path anticipation for a committed ego: a perpendicular crosser
    # only enters an NPC's 3 m lateral corridor ~1 s before impact, far too
    # late for a 12 m/s bike (8 m stopping distance) — so check the ego's
    # extrapolated positions out to ~2.4 s, not just one 0.9 s step
    # (round-3 3100 trace: flow bikes hit the crossing ego's flank at
    # 4-7 m/s after braking from only ~15 m out).
    wide = blocked_by(ego_pos, 1.3, 3.0)
    # ... but only for crossing/oncoming geometry. A same-direction LEADER
    # must never yield to a committed follower approaching from behind: the
    # extrapolated ego point lands in its forward corridor whenever
    # 2.4 s * v > gap, pinning the leader+follower pair at ~gap/2.4 m/s
    # (observed: ambient leader stuck at 3.4 m/s, ego min-speed 0.67).
    not_leader = (hdg @ ego_fwd) < 0.7
    future = jnp.zeros_like(wide)
    for k in (0.8, 1.6, 2.4):
        future = future | blocked_by(ego_pos + ego_fwd * ego_speed * k, 1.3, 3.0)
    wide = wide | (future & not_leader)
    narrow = blocked_by(ego_pos, 1.0, 2.2)
    block_e = narrow | (wide & committed)
    # vs other NPCs
    rel = pool.pos[None, :, :] - pool.pos[:, None, :]  # [N, N, 2]
    f = jnp.sum(rel * hdg[:, None, :], -1)
    l = rel[..., 0] * hdg[:, None, 1] - rel[..., 1] * hdg[:, None, 0]
    others = pool.alive[None, :] & ~jnp.eye(n, dtype=bool)
    block_n = jnp.any(others & (f > 0.0) & (f < look[:, None] * 0.8) & (jnp.abs(l) < 1.5), axis=1)
    return jnp.where(block_e | block_n, 0.0, jnp.inf)


def vehicles_step(pool: ActorPool, spec, ego_pos=None, ego_yaw=None, ego_speed=0.0,
                  dt: float = C.DT) -> ActorPool:
    """Advance NPC vehicles by mode.

    mode 1: advance along an assigned flow polyline (slot k uses flow
            min(k // FLOW_SLOT_BLOCK, 1)); despawn past the end.
    mode 2: lane-follow the route at `lane_offset`, signed `direction`.
    mode 0/3: stationary (scripted motion is applied by scenarios.py by
            rewriting mode/target_speed/lane_offset).
    """
    n = pool.pos.shape[0]
    speed = jnp.where(pool.alive, pool.speed, 0.0)
    target = pool.target_speed
    if ego_pos is not None:
        target = jnp.minimum(target, npc_collision_avoidance(pool, ego_pos, ego_yaw, ego_speed, dt))
    # relax speed toward target (first-order longitudinal control); the
    # braking bound is emergency-level (~9 m/s^2, a hard stop on dry asphalt)
    # — at the TM-parity 6 m/s^2 a flow actor braking for a slower crossing
    # ego in a merging lane still grazes its rear corner
    speed = speed + jnp.clip(target - speed, -9.0 * dt, 2.5 * dt)
    speed = jnp.where(pool.mode > 0, speed, 0.0)
    new_s = pool.flow_s + pool.direction * speed * dt

    # flow polyline assignment per slot
    flow_id = jnp.where(jnp.arange(n) < FLOW1_START, 0, 1)
    fxy = spec.flow_xy[flow_id]  # [N, F, 2]
    fdir = spec.flow_dir[flow_id]
    flen = spec.flow_len[flow_id]

    def batched_point(xy, dirs, s, nv):
        # xy is [N, M, 2]: clip the polyline index against M (axis -2), not
        # the actor count — clipping against shape[0] pinned every actor past
        # point N-2 to a linear extrapolation of one early segment
        s = jnp.clip(s, 0.0, nv)
        i0 = jnp.clip(s.astype(jnp.int32), 0, xy.shape[-2] - 2)
        frac = (s - i0.astype(jnp.float32))[..., None]
        idx = i0[..., None, None]
        p0 = jnp.take_along_axis(xy, idx, axis=-2)[..., 0, :]
        p1 = jnp.take_along_axis(xy, idx + 1, axis=-2)[..., 0, :]
        d = jnp.take_along_axis(dirs, idx, axis=-2)[..., 0, :]
        return p0 * (1 - frac) + p1 * frac, d

    flow_pos, flow_d = batched_point(fxy, fdir, new_s, flen)
    # lane-follow: route point + lateral offset
    route_pos, route_d = batched_point(
        jnp.broadcast_to(spec.route_xy, (n,) + spec.route_xy.shape),
        jnp.broadcast_to(spec.route_dir, (n,) + spec.route_dir.shape),
        new_s,
        jnp.asarray(spec.n_route, jnp.float32) - 1.0,
    )
    lane_pos = route_pos + pool.lane_offset[:, None] * left_normal(route_d)
    lane_d = route_d * pool.direction[:, None]

    is_flow = pool.mode == 1
    is_lane = pool.mode == 2
    moving = is_flow | is_lane
    pos = jnp.where(is_flow[:, None], flow_pos, jnp.where(is_lane[:, None], lane_pos, pool.pos))
    d = jnp.where(is_flow[:, None], flow_d, jnp.where(is_lane[:, None], lane_d, 0.0))
    yaw = jnp.where(moving, jnp.arctan2(d[:, 1], d[:, 0]), pool.yaw)

    # despawn at polyline end
    end = jnp.where(is_flow, flen, jnp.asarray(spec.n_route, jnp.float32) - 1.0)
    alive = pool.alive & ~(moving & (new_s >= end - 0.5) & (pool.direction > 0))
    alive = alive & ~(moving & (new_s <= 0.5) & (pool.direction < 0))

    return pool.replace(
        pos=pos, yaw=yaw, speed=speed, alive=alive,
        flow_s=jnp.where(moving, new_s, pool.flow_s),
    )


def walkers_step(pool: WalkerPool, dt: float = C.DT) -> WalkerPool:
    pos = jnp.where(pool.alive[:, None], pool.pos + pool.vel * dt, pool.pos)
    ttl = pool.ttl - dt
    alive = pool.alive & (ttl > 0.0)
    return pool.replace(pos=pos, ttl=ttl, alive=alive)


# Slot partitioning: scripted vehicles own [0, FLOW0_START); flow 0 spawns into
# [FLOW0_START, FLOW1_START); flow 1 into [FLOW1_START, N_VEHICLES).
FLOW0_START = 4
FLOW1_START = 10
