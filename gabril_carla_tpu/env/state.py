"""Scene state: one structured pytree per world, vmapped over thousands.

Replaces the CARLA server's actor registry + py_trees blackboard with
fixed-capacity, alive-masked pools (SURVEY.md §7 'variable actor counts').
All fields are flat arrays with static shapes; scenario control flow is an
integer phase machine advanced by lax.switch in scenarios.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from . import constants as C


def in_any_window(s, win):
    """Inside ANY of the [K, 2] route-arclength windows (one per scenario
    slot; an empty slot has hi <= lo and never matches). ``s`` scalar or
    [n]; returns bool of ``s``'s shape. Shared by ambient keep-clear,
    lane-allow (criteria), and the expert's overtake gate."""
    s = jnp.asarray(s)
    hit = ((s[..., None] >= win[..., 0]) & (s[..., None] <= win[..., 1])
           & (win[..., 1] > win[..., 0]))
    return jnp.any(hit, axis=-1)


@struct.dataclass
class EgoState:
    pos: jnp.ndarray  # [2] x, y (CARLA map frame, meters)
    yaw: jnp.ndarray  # scalar, radians
    speed: jnp.ndarray  # scalar, m/s (forward)
    steer: jnp.ndarray  # scalar, last applied steer in [-1, 1]
    route_idx: jnp.ndarray  # int32, nearest route point (monotonic tracker)


@struct.dataclass
class ActorPool:
    """NPC vehicles & bicycles. kind: 0=car, 1=bicycle. mode: 0=inactive,
    1=flow (advance along flow polyline), 2=lane-follow (route + lateral
    offset, signed direction), 3=scripted (scenario-controlled)."""

    pos: jnp.ndarray  # [N, 2]
    yaw: jnp.ndarray  # [N]
    speed: jnp.ndarray  # [N]
    alive: jnp.ndarray  # [N] bool
    kind: jnp.ndarray  # [N] int32
    mode: jnp.ndarray  # [N] int32
    half_extent: jnp.ndarray  # [N, 2] (half-length, half-width)
    flow_s: jnp.ndarray  # [N] arclength along its flow polyline / route
    lane_offset: jnp.ndarray  # [N] signed lateral offset (lane-follow mode)
    direction: jnp.ndarray  # [N] +1 along route, -1 oncoming
    target_speed: jnp.ndarray  # [N]
    gen: jnp.ndarray  # [N] int32 spawn generation — bumped when a flow /
    # ambient respawn recycles the slot, so collision dedup distinguishes a
    # physically new actor in an old slot (CARLA actor ids never recycle
    # within the dedup window; slot indices do)

    @staticmethod
    def empty(n: int = C.N_VEHICLES) -> "ActorPool":
        z = jnp.zeros
        return ActorPool(
            pos=z((n, 2)), yaw=z((n,)), speed=z((n,)),
            alive=jnp.zeros((n,), bool), kind=z((n,), jnp.int32),
            mode=z((n,), jnp.int32), half_extent=jnp.full((n, 2), 1.0),
            flow_s=z((n,)), lane_offset=z((n,)), direction=jnp.ones((n,)),
            target_speed=z((n,)), gen=z((n,), jnp.int32),
        )


@struct.dataclass
class WalkerPool:
    pos: jnp.ndarray  # [W, 2]
    vel: jnp.ndarray  # [W, 2] walk velocity vector
    alive: jnp.ndarray  # [W] bool
    ttl: jnp.ndarray  # [W] seconds until despawn (<=0 keeps walking)

    @staticmethod
    def empty(n: int = C.N_WALKERS) -> "WalkerPool":
        return WalkerPool(
            pos=jnp.zeros((n, 2)), vel=jnp.zeros((n, 2)),
            alive=jnp.zeros((n,), bool), ttl=jnp.zeros((n,)),
        )


@struct.dataclass
class StaticPool:
    """Props: accident vehicles, containers, opened doors, blockers."""

    pos: jnp.ndarray  # [S, 2]
    yaw: jnp.ndarray  # [S]
    half_extent: jnp.ndarray  # [S, 2]
    alive: jnp.ndarray  # [S] bool

    @staticmethod
    def empty(n: int = C.N_STATICS) -> "StaticPool":
        return StaticPool(
            pos=jnp.zeros((n, 2)), yaw=jnp.zeros((n,)),
            half_extent=jnp.full((n, 2), 0.5), alive=jnp.zeros((n,), bool),
        )


@struct.dataclass
class ScenarioState:
    """Generic phase machines for the route's K scenario slots.

    The reference's RouteScenario drives *several* smaller scenarios along
    one route (route_scenario.py:55-56 "along which several smaller
    scenarios are triggered"); each slot here is one such scenario's phase
    machine. K is a per-build static (WorldSpec.scenario_type.shape[0],
    1 for every bench2drive220 route), so single-scenario routes compile
    to exactly the single-machine program.
    """

    phase: jnp.ndarray  # [K] int32: 0=waiting for trigger, 1+ type-specific
    timer: jnp.ndarray  # [K] f32 seconds in current phase
    next_gap: jnp.ndarray  # [N_FLOWS] f32 meters until next flow spawn
    timeout: jnp.ndarray  # [K] f32 remaining scenario timeout (counts once active)
    timed_out: jnp.ndarray  # [K] bool, ScenarioTimeoutTest fired
    aux: jnp.ndarray  # [K] f32 type-specific accumulator (e.g. seconds the ego
    # has blocked the emergency vehicle, hard-brake phase entry time)

    @staticmethod
    def init(n_flows: int = 2, n_scen: int = 1) -> "ScenarioState":
        return ScenarioState(
            phase=jnp.zeros((n_scen,), jnp.int32), timer=jnp.zeros((n_scen,)),
            next_gap=jnp.zeros((n_flows,)), timeout=jnp.full((n_scen,), 240.0),
            timed_out=jnp.zeros((n_scen,), bool), aux=jnp.zeros((n_scen,)),
        )


@struct.dataclass
class Criteria:
    """Per-route infraction accumulators (srunner atomic_criteria parity)."""

    collisions_vehicle: jnp.ndarray  # int32 event counts
    collisions_pedestrian: jnp.ndarray
    collisions_static: jnp.ndarray
    last_collision_id: jnp.ndarray  # int32 global actor id of the last event
    # (-1 = none); same-id events within COLLISION_MAX_ID_TIME are one event
    last_collision_gen: jnp.ndarray  # int32 spawn generation of that actor
    # (slot reuse by a flow respawn is a NEW actor; see ActorPool.gen)
    last_collision_time: jnp.ndarray  # f32 sim seconds of the last event
    last_collision_pos: jnp.ndarray  # [2] ego position at the last event
    collision_loc_valid: jnp.ndarray  # bool: location filter armed; cleared
    # (latched) once the ego moves COLLISION_RADIUS away (atomic_criteria.py:337-343)
    red_light: jnp.ndarray  # int32
    stop_infraction: jnp.ndarray  # int32
    stop_pending: jnp.ndarray  # bool: inside some stop zone, not yet stopped
    stop_done: jnp.ndarray  # [N_STOPS] bool: full stop latched per sign
    # (RunningStopTest is per-sign, atomic_criteria.py:1799)
    outside_lane_m: jnp.ndarray  # f32 meters driven outside lanes
    driven_m: jnp.ndarray  # f32 total meters driven
    blocked_time: jnp.ndarray  # f32 consecutive seconds below BLOCKED_SPEED
    blocked: jnp.ndarray  # bool VEHICLE_BLOCKED fired
    deviated: jnp.ndarray  # bool ROUTE_DEVIATION fired
    # MinimumSpeedRouteTest accumulators (atomic_criteria.py:1957-2090):
    # ego vs ambient-traffic mean speed, folded per route-quarter checkpoint
    ms_ego_sum: jnp.ndarray  # f32 integrated ego speed since last checkpoint
    ms_amb_sum: jnp.ndarray  # f32 integrated ambient mean speed
    ms_ticks: jnp.ndarray  # f32 ticks with ambient traffic present
    ms_ckpt: jnp.ndarray  # int32 checkpoints folded so far (0..4)
    ms_penalty: jnp.ndarray  # f32 multiplicative penalty from folded checkpoints

    @staticmethod
    def init() -> "Criteria":
        i0 = jnp.asarray(0, jnp.int32)
        f0 = jnp.asarray(0.0)
        return Criteria(
            collisions_vehicle=i0, collisions_pedestrian=i0, collisions_static=i0,
            last_collision_id=jnp.asarray(-1, jnp.int32),
            last_collision_gen=i0,
            last_collision_time=jnp.asarray(-1e9),
            last_collision_pos=jnp.full((2,), 1e9),
            collision_loc_valid=jnp.asarray(False),
            red_light=i0, stop_infraction=i0,
            stop_pending=jnp.asarray(False), stop_done=jnp.zeros((C.N_STOPS,), bool),
            outside_lane_m=f0, driven_m=f0,
            blocked_time=f0, blocked=jnp.asarray(False), deviated=jnp.asarray(False),
            ms_ego_sum=f0, ms_amb_sum=f0, ms_ticks=f0,
            ms_ckpt=i0, ms_penalty=jnp.asarray(1.0),
        )


@struct.dataclass
class SceneState:
    ego: EgoState
    vehicles: ActorPool
    walkers: WalkerPool
    statics: StaticPool
    scenario: ScenarioState
    criteria: Criteria
    t: jnp.ndarray  # int32 tick counter
    done: jnp.ndarray  # bool
    rng: jnp.ndarray  # PRNG key
