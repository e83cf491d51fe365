"""DrivingEnv: pure reset/step over (WorldSpec, SceneState).

Replaces the reference's client/server tick loop (leaderboard
scenarios/scenario_manager.py:161-226: world.tick RPC -> sensor queues ->
agent -> apply_control -> py_trees tick) with one fused, jittable function:

    step : (spec, state, action7, key) -> state'

vmapped over worlds; thousands of (route, seed) rollouts run per chip.
Action codec parity: eval/my_agents/autonomous_agent.py:169-206 —
[throttle, steer, brake, handbrake, reverse, manual_gear, gear], throttle
clipped to [0,1], steer to [-1,1], brake binarized at > 0.8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import constants as C
from .ambient import ambient_reset, ambient_step
from .criteria import completion_pct, criteria_step
from .dynamics import FLOW0_START, FLOW1_START, ego_step, vehicles_step, walkers_step
from .scenarios import scenario_step
from .state import ActorPool, Criteria, EgoState, SceneState, ScenarioState, StaticPool, WalkerPool
from .world import N_FLOWS


def decode_action(action7: jnp.ndarray):
    """7-vector -> (throttle, steer, brake) with the reference's clamps.

    NaN-guarded: a diverged policy must not poison the sim state (the
    reference's np.clip would propagate NaN into carla's VehicleControl)."""
    action7 = jnp.nan_to_num(action7, nan=0.0, posinf=1.0, neginf=-1.0)
    throttle = jnp.clip(action7[..., 0], 0.0, 1.0)
    steer = jnp.clip(action7[..., 1], -1.0, 1.0)
    brake = (action7[..., 2] > 0.8).astype(jnp.float32)
    return throttle, steer, brake


class DrivingEnv:
    """Stateless env: all methods are pure functions of (spec, state)."""

    def reset(self, spec, key: jax.Array) -> SceneState:
        vehicles = ActorPool.empty()
        # scripted vehicles from the spec
        nv = vehicles.pos.shape[0]
        vehicles = vehicles.replace(
            pos=jnp.asarray(spec.veh_pos),
            yaw=jnp.asarray(spec.veh_yaw),
            kind=jnp.asarray(spec.veh_kind),
            half_extent=jnp.asarray(spec.veh_extent),
            alive=jnp.asarray(spec.veh_alive),
        )
        # pre-populate flows (ActorFlow initial_actors=True semantics)
        for flow in range(N_FLOWS):
            lo = FLOW0_START if flow == 0 else FLOW1_START
            hi = FLOW1_START if flow == 0 else C.N_VEHICLES
            n_slots = hi - lo
            mean_gap = 0.5 * (spec.flow_gap_lo[flow] + spec.flow_gap_hi[flow]) + 1e-3
            k = jnp.arange(n_slots, dtype=jnp.float32)
            s0 = spec.flow_len[flow] - (k + 1.0) * mean_gap
            live = spec.flow_enabled[flow] & (s0 > 0.0)
            sl = slice(lo, hi)

            def pt(s):
                i = jnp.clip(s.astype(jnp.int32), 0, spec.flow_xy.shape[1] - 2)
                return spec.flow_xy[flow][i], spec.flow_dir[flow][i]

            p, d = jax.vmap(pt)(jnp.maximum(s0, 0.0))
            kind = spec.flow_kind[flow]
            extent = jnp.where(kind == 1, jnp.asarray([0.9, 0.4]), jnp.asarray([2.4, 0.95]))
            vehicles = vehicles.replace(
                pos=vehicles.pos.at[sl].set(jnp.where(live[:, None], p, vehicles.pos[sl])),
                yaw=vehicles.yaw.at[sl].set(jnp.where(live, jnp.arctan2(d[:, 1], d[:, 0]), vehicles.yaw[sl])),
                speed=vehicles.speed.at[sl].set(jnp.where(live, spec.flow_speed[flow], 0.0)),
                target_speed=vehicles.target_speed.at[sl].set(jnp.where(live, spec.flow_speed[flow], 0.0)),
                alive=vehicles.alive.at[sl].set(live),
                mode=vehicles.mode.at[sl].set(jnp.where(live, 1, 0)),
                kind=vehicles.kind.at[sl].set(jnp.where(live, kind, 0)),
                flow_s=vehicles.flow_s.at[sl].set(jnp.maximum(s0, 0.0)),
                half_extent=vehicles.half_extent.at[sl].set(
                    jnp.where(live[:, None], extent[None, :], vehicles.half_extent[sl])
                ),
            )

        vehicles = ambient_reset(spec, vehicles)

        statics = StaticPool(
            pos=jnp.asarray(spec.statics_pos),
            yaw=jnp.asarray(spec.statics_yaw),
            half_extent=jnp.asarray(spec.statics_extent),
            alive=jnp.asarray(spec.statics_alive),
        )
        return SceneState(
            ego=EgoState(
                pos=jnp.asarray(spec.spawn_pos),
                yaw=jnp.asarray(spec.spawn_yaw),
                speed=jnp.asarray(0.0),
                steer=jnp.asarray(0.0),
                route_idx=jnp.asarray(0, jnp.int32),
            ),
            vehicles=vehicles,
            walkers=WalkerPool.empty(),
            statics=statics,
            scenario=ScenarioState.init(N_FLOWS, n_scen=spec.scenario_type.shape[0]).replace(
                next_gap=0.5 * (jnp.asarray(spec.flow_gap_lo) + jnp.asarray(spec.flow_gap_hi))
            ),
            criteria=Criteria.init(),
            t=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
            rng=key,
        )

    def step(self, spec, state: SceneState, action7: jnp.ndarray, key: jax.Array | None = None) -> SceneState:
        if key is None:
            key, sub = jax.random.split(state.rng)
        else:
            sub = key
            key = state.rng
        prev = state
        throttle, steer, brake = decode_action(action7)
        sub, sub_amb = jax.random.split(sub)
        state = scenario_step(spec, state, sub)
        state = ambient_step(spec, state, sub_amb)
        state = state.replace(
            vehicles=vehicles_step(state.vehicles, spec, state.ego.pos, state.ego.yaw,
                                   state.ego.speed),
            walkers=walkers_step(state.walkers),
            ego=ego_step(state.ego, throttle, steer, brake),
        )
        state = criteria_step(spec, state)

        pct = completion_pct(spec, state)
        timeout_s = jnp.maximum(C.MIN_ROUTE_TIMEOUT, spec.route_len / C.TIMEOUT_SPEED)
        done = (
            (pct >= 100.0)
            | state.criteria.deviated
            | state.criteria.blocked
            | (state.t.astype(jnp.float32) * C.DT > timeout_s)
        )
        state = state.replace(t=state.t + 1, done=done, rng=key)
        # freeze the world after done (scores are read from the final state)
        return jax.tree.map(lambda old, new: jnp.where(prev.done, old, new), prev, state)
