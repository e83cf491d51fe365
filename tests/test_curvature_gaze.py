"""Curvature-anticipating road fixation (opt-in analytic_gaze mode).

Behavioral contract (Land & Lee 1994 tangent-point gaze; docs/ROADMAP.md
round-5 gaze-quality item): preview distance scales with speed, the
fixation shifts toward the INSIDE lane edge of an upcoming curve, and
straight roads keep a centered fixation. The default
(curvature_anticipation=False) must stay bit-for-bit the anchored 15 m
fixation — every cached dataset depends on it.
"""

import numpy as np
import jax
import jax.numpy as jnp

import gabril_carla_tpu.ops.raster as R
from gabril_carla_tpu.env import DrivingEnv
from gabril_carla_tpu.env.world import build_world_spec


def _spec(wps):
    return jax.tree.map(jnp.asarray, build_world_spec({
        "id": 7, "town": "T", "waypoints": np.asarray(wps, np.float32),
        "scenarios": [], "weather": [5, 0, 2, 90]}))


def _state(spec, speed=8.0, route_idx=2):
    st = DrivingEnv().reset(spec, jax.random.PRNGKey(0))
    ego = st.ego.replace(speed=jnp.asarray(speed, jnp.float32),
                         route_idx=jnp.asarray(route_idx, st.ego.route_idx.dtype))
    return st.replace(ego=ego)


def _straight():
    x = np.arange(0.0, 160.0, 2.0)
    return _spec(np.stack([x, np.zeros_like(x)], 1))


def _right_curve(radius=30.0):
    # east heading curving toward +y = driver's right in the y-south frame
    t = np.linspace(0.0, 1.4, 80)
    return _spec(np.stack([radius * np.sin(t), radius * (1.0 - np.cos(t))], 1))


def _road_px(spec, st, **kw):
    g = np.asarray(R.analytic_gaze(spec, st, **kw)).reshape(-1, 2)
    assert (g[0] >= 0.0).all(), "road fixation must stay on-screen"
    return g[0]


def test_default_path_is_bitwise_unchanged():
    spec = _right_curve()
    st = _state(spec)
    g0 = np.asarray(R.analytic_gaze(spec, st))
    g1 = np.asarray(R.analytic_gaze(spec, st, curvature_anticipation=False))
    assert np.array_equal(g0, g1)


def test_straight_road_fixation_stays_centered():
    spec = _straight()
    st = _state(spec)
    plain = _road_px(spec, st)
    curved = _road_px(spec, st, curvature_anticipation=True)
    # no curve -> no lateral shift (same image column within a pixel)
    assert abs(curved[0] - plain[0]) < 1.5 / (R.W - 1)


def _unproject_ground(spec, st, gxy):
    """Image-coord gaze point -> world xy on the ground plane."""
    cam, fwd, right = R._camera_basis(st.ego.pos, st.ego.yaw)
    u_px, v_px = gxy[0] * (R.W - 1), gxy[1] * (R.H - 1)
    depth = R.CAM_Z * R.FX / (v_px - R.CY)
    lat = (u_px - R.CX) * depth / R.FX
    return np.asarray(cam) + depth * np.asarray(fwd) + lat * np.asarray(right)


def _lateral_right_of_route(spec, p):
    """Signed distance of world point p from the route centerline, +right."""
    xy = np.asarray(spec.route_xy)[: int(spec.n_route)]
    j = np.argmin(np.sum((xy - p[None]) ** 2, axis=1))
    d = np.asarray(spec.route_dir)[j]
    rel = p - xy[j]
    return d[0] * rel[1] - d[1] * rel[0]


def test_curve_fixation_shifts_to_inside_edge():
    spec = _right_curve()
    st = _state(spec)
    plain_lat = _lateral_right_of_route(
        spec, _unproject_ground(spec, st, _road_px(spec, st)))
    curved_lat = _lateral_right_of_route(
        spec, _unproject_ground(
            spec, st, _road_px(spec, st, curvature_anticipation=True)))
    # the plain fixation rides the centerline; the tangent-point fixation
    # sits toward the inside (right) lane edge of a right curve
    assert abs(plain_lat) < 0.3
    assert 0.3 < curved_lat < 1.8


def test_preview_distance_scales_with_speed():
    spec = _straight()
    slow = _road_px(spec, _state(spec, speed=3.0), curvature_anticipation=True)
    fast = _road_px(spec, _state(spec, speed=14.0), curvature_anticipation=True)
    # farther fixation projects higher in the image (smaller v)
    assert fast[1] < slow[1] - 2.0 / (R.H - 1)
