"""CollisionTest dedup + walker-contact parity.

Reference semantics (atomic_criteria.py CollisionTest, :296-298 and
_count_collisions :360-384): same actor id within MAX_ID_TIME (5 s) counts
once; any collision within COLLISION_RADIUS (5 m) of the last event's
location counts once; collisions while the ego is ~stationary (<0.1 m/s)
are not the ego's fault. Walker contact is actual bbox contact (collision
sensor), not a center-distance circle.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gabril_carla_tpu.env import constants as C
from gabril_carla_tpu.env.criteria import criteria_step


def make_spec():
    from gabril_carla_tpu.env.world import build_world_spec

    wps = np.stack([np.arange(0.0, 100, 2.0), np.zeros(50)], 1).astype(np.float32)
    return jax.tree.map(jnp.asarray, build_world_spec(
        {"id": 9, "town": "T", "waypoints": wps, "scenarios": [], "weather": [0, 0, 0, 90]}))


def base_state(spec, x=10.0, speed=5.0):
    from gabril_carla_tpu.env import DrivingEnv

    st = DrivingEnv().reset(spec, jax.random.PRNGKey(0))
    return st.replace(ego=st.ego.replace(
        pos=jnp.asarray([x, 0.0]), yaw=jnp.asarray(0.0), speed=jnp.asarray(speed)))


def with_vehicle(st, slot, pos, alive=True):
    v = st.vehicles
    v = v.replace(
        pos=v.pos.at[slot].set(jnp.asarray(pos)),
        alive=v.alive.at[slot].set(alive),
        half_extent=v.half_extent.at[slot].set(jnp.asarray([2.3, 0.9])),
    )
    return st.replace(vehicles=v)


def with_walker(st, slot, pos, alive=True):
    w = st.walkers
    w = w.replace(pos=w.pos.at[slot].set(jnp.asarray(pos)),
                  alive=w.alive.at[slot].set(alive))
    return st.replace(walkers=w)


step = jax.jit(criteria_step)


def test_two_distinct_vehicles_two_events():
    spec = make_spec()
    st = with_vehicle(base_state(spec, x=10.0), 0, [10.5, 0.0])
    st = step(spec, st)
    assert int(st.criteria.collisions_vehicle) == 1
    # ego moves 8 m on (past the 5 m location radius), hits a DIFFERENT
    # vehicle 1 s later -> second event even inside the 5 s id window
    st = st.replace(ego=st.ego.replace(pos=jnp.asarray([18.0, 0.0])),
                    t=jnp.asarray(20, jnp.int32))
    st = with_vehicle(st, 0, [10.5, 0.0], alive=False)
    st = with_vehicle(st, 1, [18.5, 0.0])
    st = step(spec, st)
    assert int(st.criteria.collisions_vehicle) == 2


def test_same_vehicle_grind_counts_once():
    spec = make_spec()
    st = with_vehicle(base_state(spec, x=10.0), 0, [10.5, 0.0])
    for t in range(5):
        st = st.replace(t=jnp.asarray(t, jnp.int32))
        st = step(spec, st)
    assert int(st.criteria.collisions_vehicle) == 1
    # even pushing the same vehicle 8 m down the road within the 5 s id
    # window stays one event (id filter, not just location)
    st = st.replace(ego=st.ego.replace(pos=jnp.asarray([18.0, 0.0])),
                    t=jnp.asarray(40, jnp.int32))
    st = with_vehicle(st, 0, [18.5, 0.0])
    st = step(spec, st)
    assert int(st.criteria.collisions_vehicle) == 1


def test_same_vehicle_reregisters_after_id_window():
    spec = make_spec()
    st = with_vehicle(base_state(spec, x=10.0), 0, [10.5, 0.0])
    st = step(spec, st)
    assert int(st.criteria.collisions_vehicle) == 1
    # 6 s later (> MAX_ID_TIME) and 8 m away: the same actor re-registers
    st = st.replace(ego=st.ego.replace(pos=jnp.asarray([18.0, 0.0])),
                    t=jnp.asarray(120, jnp.int32))
    st = with_vehicle(st, 0, [18.5, 0.0])
    st = step(spec, st)
    assert int(st.criteria.collisions_vehicle) == 2


def test_distinct_vehicles_same_location_count_once():
    spec = make_spec()
    st = with_vehicle(base_state(spec, x=10.0), 0, [10.5, 0.0])
    st = step(spec, st)
    # different vehicle, but the ego has only moved 2 m (< 5 m radius)
    st = st.replace(ego=st.ego.replace(pos=jnp.asarray([12.0, 0.0])),
                    t=jnp.asarray(10, jnp.int32))
    st = with_vehicle(st, 0, [10.5, 0.0], alive=False)
    st = with_vehicle(st, 1, [12.5, 0.0])
    st = step(spec, st)
    assert int(st.criteria.collisions_vehicle) == 1


def test_walker_side_graze_does_not_fire():
    spec = make_spec()
    # walker 1.35 m lateral of the ego center: inside the old
    # EGO_HALF_LEN+0.4 circle but 0.42 m clear of the actual ego box
    st = with_walker(base_state(spec, x=10.0), 0, [10.0, 1.35])
    st = step(spec, st)
    assert int(st.criteria.collisions_pedestrian) == 0


def test_walker_contact_fires():
    spec = make_spec()
    st = with_walker(base_state(spec, x=10.0), 0, [12.6, 0.0])  # at the bumper
    st = step(spec, st)
    assert int(st.criteria.collisions_pedestrian) == 1


def test_stationary_ego_not_at_fault():
    spec = make_spec()
    st = with_walker(base_state(spec, x=10.0, speed=0.0), 0, [12.6, 0.0])
    st = step(spec, st)
    assert int(st.criteria.collisions_pedestrian) == 0


def test_recycled_slot_is_a_new_actor():
    """A flow respawn recycling the slot of a just-hit actor within
    MAX_ID_TIME must register a second event: identity is (slot, spawn
    generation), matching CARLA's never-recycled actor ids."""
    spec = make_spec()
    st = with_vehicle(base_state(spec, x=10.0), 0, [10.5, 0.0])
    st = step(spec, st)
    assert int(st.criteria.collisions_vehicle) == 1
    # the flow recycles slot 0 for a NEW bike 1 s later (gen bumps); the ego
    # has moved past the 5 m location radius and hits it
    v = st.vehicles
    st = st.replace(
        ego=st.ego.replace(pos=jnp.asarray([18.0, 0.0])),
        t=jnp.asarray(20, jnp.int32),
        vehicles=v.replace(pos=v.pos.at[0].set(jnp.asarray([18.5, 0.0])),
                           gen=v.gen.at[0].set(v.gen[0] + 1)))
    st = step(spec, st)
    assert int(st.criteria.collisions_vehicle) == 2
    # same slot, same generation (the same grinding actor) stays one event
    st2 = with_vehicle(base_state(spec, x=10.0), 1, [10.5, 0.0])
    st2 = step(spec, st2)
    st2 = st2.replace(ego=st2.ego.replace(pos=jnp.asarray([18.0, 0.0])),
                      t=jnp.asarray(20, jnp.int32))
    st2 = with_vehicle(st2, 1, [18.5, 0.0])
    st2 = step(spec, st2)
    assert int(st2.criteria.collisions_vehicle) == 1
