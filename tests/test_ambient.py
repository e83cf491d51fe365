"""Ambient background traffic (BackgroundBehavior-lite) + min-speed tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gabril_carla_tpu.env import DrivingEnv
from gabril_carla_tpu.env.ambient import AMBIENT_SAME, ambient_speeds
from gabril_carla_tpu.env.criteria import compute_score
from gabril_carla_tpu.env.expert import expert_action
from gabril_carla_tpu.env.world import build_world_spec


def straight(length=300, scenario="None", extra=None, ambient=True):
    wps = np.stack([np.arange(0.0, length, 2.0), np.zeros(length // 2)], 1).astype(np.float32)
    scen = {"type": scenario, "trigger": (60.0, 0.0, 0.0)}
    if extra:
        scen.update(extra)
    return jax.tree.map(jnp.asarray, build_world_spec(
        {"id": 7, "town": "T", "waypoints": wps, "scenarios": [scen],
         "weather": [0, 0, 0, 90]}, ambient=ambient))


def run_expert(spec, steps=2000):
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(3))

    def body(s, _):
        s = env.step(spec, s, expert_action(spec, s))
        return s, s.vehicles.alive[AMBIENT_SAME:].sum()

    return jax.lax.scan(body, st, None, length=steps)


def test_ambient_populates_and_recycles():
    spec = straight(300)
    # 700 ticks = 35 s: well before the ~43 s route completion (after done
    # the state freezes, and near the goal there is no room to respawn)
    st, alive_trace = jax.jit(run_expert, static_argnums=1)(spec, 700)
    alive = np.asarray(alive_trace)
    # traffic exists essentially the whole drive
    assert (alive >= 2).mean() > 0.9
    # and is continuously recycled rather than bleeding out
    assert alive[-100:].mean() >= 2.0


def test_ambient_disabled_spawns_nothing():
    spec = straight(300, ambient=False)
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(0))
    assert int(st.vehicles.alive[AMBIENT_SAME:].sum()) == 0
    st, alive_trace = jax.jit(run_expert, static_argnums=1)(spec, 300)
    assert int(np.asarray(alive_trace).max()) == 0


def test_expert_drives_well_in_traffic():
    """Expert completes a long route among ambient traffic with no
    collisions and at most mild min-speed penalties."""
    spec = straight(300)
    st, _ = jax.jit(run_expert, static_argnums=1)(spec, 2000)
    sc = compute_score(spec, st)
    assert int(sc["collisions_vehicle"]) == 0
    assert float(sc["score_route"]) == 100.0
    assert float(sc["score_composed"]) >= 90.0


def test_min_speed_penalty_fires_for_slow_ego():
    """An ego crawling at ~1.5 m/s among 7 m/s traffic loses min-speed
    points at every checkpoint (MinimumSpeedRouteTest, checkpoints=4,
    route_scenario.py:308, atomic_criteria.py:2040-2075)."""
    spec = straight(240)
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(0))
    crawl = jnp.asarray([0.12, 0.0, 0.0, 0, 0, 0, 0])

    def body(s, _):
        return env.step(spec, s, crawl), None

    st, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=2000))(st)
    sc = compute_score(spec, st)
    pen = float(np.asarray(st.criteria.ms_penalty))
    assert int(np.asarray(st.criteria.ms_ckpt)) >= 1
    assert pen < 0.95  # multiple failing checkpoints compound
    assert float(sc["min_speed_penalty"]) <= pen + 1e-6


def test_ambient_respects_clear_window():
    """Scenario keep-clear windows (LeaveSpaceInFront analogue) stay empty."""
    spec = straight(300, scenario="AccidentTwoWays",
                    extra={"distance": 60.0, "frequency": (40.0, 70.0)})
    lo, hi = float(spec.amb_clear[0, 0]), float(spec.amb_clear[0, 1])
    assert hi > lo
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(1))

    def body(s, _):
        s = env.step(spec, s, jnp.asarray([0.4, 0, 0, 0, 0, 0, 0]))
        amb_alive = s.vehicles.alive[AMBIENT_SAME:]
        amb_s = s.vehicles.flow_s[AMBIENT_SAME:]
        inside = jnp.any(amb_alive & (amb_s > lo + 1) & (amb_s < hi - 1)
                         & (s.vehicles.direction[AMBIENT_SAME:] > 0))
        return s, inside

    st, inside_trace = jax.jit(lambda s: jax.lax.scan(body, s, None, length=1200))(st)
    assert not bool(np.asarray(inside_trace).any())


def test_ambient_mean_speed_measure():
    spec = straight(300)
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(0))
    mean0, has0 = ambient_speeds(st.vehicles)
    assert bool(has0)
    assert float(mean0) == 0.0  # ambient cold-starts like the ego

    def body(s, _):  # ego idles; ambient reaches cruise on its own
        return env.step(spec, s, jnp.zeros(7)), None

    st, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=150))(st)
    mean, has = ambient_speeds(st.vehicles)
    assert bool(has)
    assert 4.0 <= float(mean) <= 8.0


def test_leader_does_not_yield_to_committed_follower():
    """A same-direction leader must never brake for a committed ego behind
    it: the swept-path extrapolation (npc_collision_avoidance) previously
    landed the ego's 2.4 s-extrapolated point inside the leader's forward
    corridor whenever 2.4*v > gap, pinning leader+follower at ~gap/2.4 m/s
    and bleeding MinimumSpeedRouteTest checkpoints. Crossing geometry must
    still trigger the anticipation (the route-3099/3100 flank-hit fix)."""
    from gabril_carla_tpu.env.dynamics import npc_collision_avoidance
    from gabril_carla_tpu.env.state import ActorPool

    pool = ActorPool.empty(4)
    # slot 0: leader 9 m dead ahead of the ego, same heading, cruising
    # slot 1: perpendicular crosser whose corridor the ego's extrapolated
    #         position enters (ego at 7 m/s -> reaches x=16.8 within 2.4 s;
    #         crosser at (17, -8) heading +y sees that point ~8 m ahead)
    pool = pool.replace(
        pos=pool.pos.at[0].set(jnp.asarray([9.0, 0.0]))
                    .at[1].set(jnp.asarray([17.0, -8.0])),
        yaw=pool.yaw.at[1].set(jnp.pi / 2),
        speed=pool.speed.at[0].set(7.0).at[1].set(7.0),
        alive=pool.alive.at[0].set(True).at[1].set(True),
    )
    cap = npc_collision_avoidance(pool, jnp.zeros(2), jnp.asarray(0.0),
                                  ego_speed=jnp.asarray(7.0))
    cap = np.asarray(cap)
    assert np.isinf(cap[0]), "leader braked for a follower behind it"
    assert cap[1] == 0.0, "crosser ignored the committed ego's swept path"
