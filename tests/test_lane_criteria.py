"""OutsideRouteLanesTest parity: wrong-lane vs off-road detectors.

Reference semantics (atomic_criteria.py OutsideRouteLanesTest):
  _is_outside_driving_lanes (:1106-1127) fires beyond lane_width/2 +
  ALLOWED_OUT_DISTANCE (0.5 m, :996) from the nearest driving-lane center;
  _is_at_wrong_lane (:1129-1160) fires on oncoming-lane invasion, is
  suppressed inside junctions (:1138) and switched off by TwoWays scenarios
  via the blackboard (:1043); either detector accrues wrong-distance
  (:1051, :1071-1072).

The test route runs along +x (tangent (1,0)); in CARLA's y-south frame the
driver's left is -y, so signed_lat = -y: y=-3.5 is the oncoming lane,
y=+3.0 is past the right road edge.
"""

import dataclasses

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


def state_at(spec, x, y, route_idx=None, speed=5.0):
    from gabril_carla_tpu.env import DrivingEnv

    st = DrivingEnv().reset(spec, jax.random.PRNGKey(0))
    idx = int(x) if route_idx is None else route_idx
    return st.replace(ego=st.ego.replace(
        pos=jnp.asarray([float(x), float(y)]), yaw=jnp.asarray(0.0),
        speed=jnp.asarray(speed), route_idx=jnp.asarray(idx, jnp.int32)))


step = jax.jit(criteria_step)


def accrued(spec, st):
    return float(step(spec, st).criteria.outside_lane_m)


def test_in_lane_no_accrual():
    spec = make_spec()
    assert accrued(spec, state_at(spec, 30.0, 0.0)) == 0.0


def test_oncoming_lane_is_wrong_lane():
    spec = make_spec()
    # one lane to the left (signed_lat = +3.5): oncoming-lane invasion
    assert accrued(spec, state_at(spec, 30.0, -3.5)) > 0.0


def test_lane_allow_window_suppresses_wrong_lane_but_not_off_road():
    spec = make_spec()
    spec = dataclasses.replace(spec, lane_allow=jnp.asarray([[10.0, 60.0]]))
    # legitimate TwoWays overtake in the oncoming lane
    assert accrued(spec, state_at(spec, 30.0, -3.5)) == 0.0
    # but past the FAR road edge (beyond 1.5w + 0.5 left) still accrues
    assert accrued(spec, state_at(spec, 30.0, -6.0)) > 0.0


def test_right_shoulder_allowance():
    spec = make_spec()
    # within lane_width/2 + ALLOWED_OUT_DISTANCE of the lane center: ok
    assert accrued(spec, state_at(spec, 30.0, 2.0)) == 0.0
    # beyond the road edge: off-road
    assert accrued(spec, state_at(spec, 30.0, 3.0)) > 0.0


def test_junction_pavement_suppresses_both_detectors():
    spec = make_spec()
    f = np.linspace(-40.0, 40.0, C.MAX_FLOW_POINTS, dtype=np.float32)
    flow_xy = np.zeros((2, C.MAX_FLOW_POINTS, 2), np.float32)
    flow_xy[0, :, 0] = 30.0
    flow_xy[0, :, 1] = f
    flow_dir = np.zeros((2, C.MAX_FLOW_POINTS, 2), np.float32)
    flow_dir[0, :, 1] = 1.0
    spec = dataclasses.replace(
        spec, flow_xy=jnp.asarray(flow_xy), flow_dir=jnp.asarray(flow_dir),
        flow_enabled=jnp.asarray([True, False]))
    # laterally displaced onto the crossing road inside the junction: the
    # crossing driving lane covers the ego (is_junction in the reference)
    assert accrued(spec, state_at(spec, 30.0, 3.0)) == 0.0
    assert accrued(spec, state_at(spec, 30.0, -3.5)) == 0.0
    # far from the junction the crossing flow gives no cover
    assert accrued(spec, state_at(spec, 70.0, 3.0)) > 0.0


def test_parallel_flow_gives_no_junction_cover():
    spec = make_spec()
    # an oncoming TwoWays flow runs PARALLEL one lane left — it must not
    # read as junction pavement (|flow_dir . route_dir| ~ 1)
    flow_xy = np.zeros((2, C.MAX_FLOW_POINTS, 2), np.float32)
    flow_xy[1, :, 0] = np.linspace(0.0, 100.0, C.MAX_FLOW_POINTS)
    flow_xy[1, :, 1] = -3.5
    flow_dir = np.zeros((2, C.MAX_FLOW_POINTS, 2), np.float32)
    flow_dir[1, :, 0] = -1.0
    spec = dataclasses.replace(
        spec, flow_xy=jnp.asarray(flow_xy), flow_dir=jnp.asarray(flow_dir),
        flow_enabled=jnp.asarray([False, True]))
    assert accrued(spec, state_at(spec, 30.0, -3.5)) > 0.0
