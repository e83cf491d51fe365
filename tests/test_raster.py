"""Rasterizer tests: XLA oracle sanity + Pallas kernel parity (interpreted)."""

import numpy as np
import jax
import jax.numpy as jnp

import gabril_carla_tpu.ops.raster as R
from gabril_carla_tpu.env import DrivingEnv
from gabril_carla_tpu.env.world import build_world_spec


def scene():
    wps = np.stack([np.arange(0.0, 160, 2.0), 10 * np.sin(np.arange(80) * 0.08)], 1).astype(np.float32)
    spec = jax.tree.map(jnp.asarray, build_world_spec({
        "id": 1, "town": "T", "waypoints": wps,
        "scenarios": [{"type": "PedestrianCrossing", "trigger": (30.0, 0.5, 0.0)}],
        "weather": [5, 0, 2, 90]}))
    env = DrivingEnv()
    act = jnp.asarray([0.5, 0, 0, 0, 0, 0, 0])
    st, _ = jax.jit(
        lambda k: jax.lax.scan(lambda s, _: (env.step(spec, s, act), None), env.reset(spec, k), None, length=50)
    )(jax.random.PRNGKey(0))
    return spec, st


def test_render_frame_structure():
    spec, st = scene()
    img = np.asarray(R.render_frame(spec, st))
    assert img.shape == (180, 320)
    assert 0.0 <= img.min() and img.max() <= 1.0
    # sky at top, road (darker) in the lower center
    assert img[:40].mean() > 0.55
    assert img[150:, 130:190].mean() < 0.45


def test_pallas_kernel_matches_xla_oracle():
    spec, st = scene()
    _assert_kernel_matches_oracle(spec, st)


def _assert_kernel_matches_oracle(spec, st, block_rows=32):
    cam, fwd, right = R._camera_basis(st.ego.pos, st.ego.yaw)
    boxes = jnp.concatenate(
        [R._collect_actor_boxes(st, cam, fwd, right), R._signal_boxes(spec, st, cam, fwd, right)]
    )
    weather = R.weather_now(spec, st)
    oracle = np.asarray(R._render_frame_xla(spec, st, cam, fwd, right, boxes, weather))

    from gabril_carla_tpu.ops.pallas_raster import render_frame_pallas

    cam_scalars, route_cols, cboxes = R._pallas_inputs(spec, st, cam, fwd, right, boxes, weather)
    img = np.asarray(
        render_frame_pallas(cam_scalars, route_cols, cboxes, route_cols.shape[0],
                            cboxes.shape[0], R.ROUTE_VIEW, interpret=True,
                            block_rows=block_rows)
    )
    d = np.abs(img - oracle)
    # tie-breaking at dash/edge boundaries flips a handful of pixels
    assert (d > 1e-3).mean() < 0.01
    assert np.median(d) < 1e-5


def test_pallas_kernel_block_rows_parity():
    """Fatter tiles (64/128 rows) keep output parity: depth-class tile
    boundaries realign (a boundary-spanning tile takes the deeper class's
    prefix) and the last ground tile drags sky pixels through the route
    loop without affecting them."""
    spec, st = scene()
    for block in (64, 128):
        _assert_kernel_matches_oracle(spec, st, block_rows=block)


def _weather_spec(spec, cloud, precip, fog, sun, wet):
    keys = np.zeros((spec.weather_keys.shape[0], 6), np.float32)
    keys[:, 0] = 100.0
    keys[0] = [0.0, cloud, precip, fog, sun, wet]
    keys[1] = [100.0, cloud, precip, fog, sun, wet]
    return spec.replace(weather_keys=jnp.asarray(keys), n_weather=jnp.asarray(2, jnp.int32))


def test_pallas_kernel_weather_parity():
    """Kernel parity holds on a foggy rainy night frame (weather math is
    replicated in both paths)."""
    spec, st = scene()
    spec = _weather_spec(spec, cloud=80.0, precip=70.0, fog=60.0, sun=-30.0, wet=90.0)
    _assert_kernel_matches_oracle(spec, st)


def test_weather_effects_visible():
    """Fog shortens visibility, night dims everything (weather_sim parity)."""
    spec, st = scene()
    clear = np.asarray(R.render_frame(_weather_spec(spec, 0, 0, 0, 90, 0), st))
    foggy = np.asarray(R.render_frame(_weather_spec(spec, 0, 0, 100, 90, 0), st))
    night = np.asarray(R.render_frame(_weather_spec(spec, 0, 0, 0, -90, 0), st))
    assert night.mean() < clear.mean() - 0.2
    # fog: distant rows (just below horizon) converge to the sky color
    horizon_band = slice(91, 100)
    assert foggy[horizon_band].std() < clear[horizon_band].std()


def test_weather_keyframe_interpolation():
    """RouteWeatherBehavior: weather interpolates between route-% keyframes
    (weather_sim.py:169+)."""
    spec, st = scene()
    keys = np.zeros((spec.weather_keys.shape[0], 6), np.float32)
    keys[0] = [0.0, 0, 0, 0, 90, 0]
    keys[1] = [100.0, 100, 0, 100, 90, 0]
    keys[2:] = keys[1]
    spec = spec.replace(weather_keys=jnp.asarray(keys), n_weather=jnp.asarray(2, jnp.int32))
    # ego halfway down the route
    halfway = st.replace(ego=st.ego.replace(
        route_idx=jnp.asarray(int(spec.route_len) // 2, jnp.int32)))
    w = np.asarray(R.weather_now(spec, halfway))
    assert abs(w[0] - 0.5) < 0.02  # cloud01 ~ 0.5
    assert abs(w[2] - 0.5) < 0.02  # fog01 ~ 0.5
    w0 = np.asarray(R.weather_now(spec, st.replace(ego=st.ego.replace(
        route_idx=jnp.asarray(0, jnp.int32)))))
    assert w0[2] < 0.01


def crossing_scene():
    """Straight route with a perpendicular bicycle flow crossing at x=60."""
    wps = np.stack([np.arange(0.0, 160, 2.0), np.zeros(80)], 1).astype(np.float32)
    spec = jax.tree.map(jnp.asarray, build_world_spec({
        "id": 2, "town": "T", "waypoints": wps,
        "scenarios": [{"type": "CrossingBicycleFlow", "trigger": (40.0, 0.0, 0.0),
                       "start_actor_flow": (60.0, -40.0), "end_actor_flow": (60.0, 40.0),
                       "flow_speed": 8.0, "source_dist_interval": (12.0, 25.0)}],
        "weather": [0, 0, 0, 90]}))
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(0))
    # 30 m short of the crossing: the crossing road fills a clear band
    st = st.replace(ego=st.ego.replace(pos=jnp.asarray([30.0, 0.0]),
                                       route_idx=jnp.asarray(30, jnp.int32)))
    return spec, st


def test_crossing_flow_renders_road_surface():
    """The crossing road at a junction renders as road, not grass
    (UE4 renders full town geometry, SURVEY §2 L0; round-2 gap #4)."""
    spec, st = crossing_scene()
    with_flow = np.asarray(R.render_frame(spec, st))
    spec_off = spec.replace(flow_enabled=spec.flow_enabled.at[0].set(False))
    without = np.asarray(R.render_frame(spec_off, st))
    # pixels that flipped from grass to road-ish on the crossing road
    changed = (np.abs(without - R.GRASS) < 0.1) & (with_flow < without - 0.05)
    assert changed.sum() > 300
    # and the ego's own road is untouched (bottom center)
    np.testing.assert_allclose(with_flow[150:, 140:180], without[150:, 140:180])


def test_pallas_kernel_matches_oracle_with_crossing_flow():
    spec, st = crossing_scene()
    _assert_kernel_matches_oracle(spec, st)


def test_analytic_gaze_points_valid():
    # AccidentTwoWays pre-places static props + an oncoming flow -> salient
    wps = np.stack([np.arange(0.0, 200, 2.0), np.zeros(100)], 1).astype(np.float32)
    spec = jax.tree.map(jnp.asarray, build_world_spec({
        "id": 1, "town": "T", "waypoints": wps,
        "scenarios": [{"type": "AccidentTwoWays", "trigger": (20.0, 0.0, 0.0),
                       "distance": 40.0, "frequency": (30.0, 60.0)}],
        "weather": [0, 0, 0, 90]}))
    env = DrivingEnv()
    act = jnp.asarray([0.6, 0, 0, 0, 0, 0, 0])
    st, _ = jax.jit(
        lambda k: jax.lax.scan(lambda s, _: (env.step(spec, s, act), None), env.reset(spec, k), None, length=80)
    )(jax.random.PRNGKey(0))
    g = np.asarray(R.analytic_gaze(spec, st)).reshape(-1, 2)
    valid = g[g[:, 0] >= 0]
    assert len(valid) >= 1  # accident props ahead should be salient
    assert np.all((valid >= 0) & (valid <= 1))


def test_analytic_gaze_prefers_closing_hazard_over_near_parked():
    """Hazard-weighted gaze: a crossing vehicle closing at speed outranks a
    nearer parked car (round-2 AGIL falsification: depth-ordered gaze wasted
    slots on parked scenery)."""
    wps = np.stack([np.arange(0.0, 200, 2.0), np.zeros(100)], 1).astype(np.float32)
    spec = jax.tree.map(jnp.asarray, build_world_spec({
        "id": 1, "town": "T", "waypoints": wps, "scenarios": [],
        "weather": [0, 0, 0, 90]}))
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(0))
    st = st.replace(ego=st.ego.replace(pos=jnp.asarray([0.0, 0.0]),
                                       speed=jnp.asarray(6.0)))
    v = st.vehicles
    # slot 0: parked car 12 m ahead, slightly right; slot 1: crossing car
    # 30 m ahead closing at 10 m/s from the left (ambient spawns cleared)
    alive = jnp.zeros_like(v.alive).at[0].set(True).at[1].set(True)
    v = v.replace(
        pos=v.pos.at[0].set(jnp.asarray([12.0, 2.5])).at[1].set(jnp.asarray([30.0, -12.0])),
        yaw=v.yaw.at[1].set(jnp.asarray(np.pi / 2)),  # +y motion, toward route
        speed=v.speed.at[1].set(10.0),
        alive=alive,
    )
    st = st.replace(vehicles=v)
    g = np.asarray(R.analytic_gaze(spec, st, max_points=2)).reshape(-1, 2)
    # one actor slot only: it must go to the crossing car (left half of the
    # screen, since +y in CARLA's y-south frame is the driver's right... the
    # crosser sits at y=-12 -> driver's left -> u < center)
    assert g[1, 0] >= 0, "actor slot must be valid"
    assert g[1, 0] < 0.5, f"actor slot should fixate the crossing car, got u={g[1, 0]:.2f}"


def test_confounded_overlay_draws_brake_dot():
    img = jnp.zeros((180, 320))
    out = np.asarray(R.confounded_overlay(img, jnp.asarray([0, 0.5, 1.0, 0, 0, 0, 0])))
    assert out.max() == 1.0
    assert (out > 0.9).sum() > 20


def test_pallas_prefix_fallback_on_tight_loop_route():
    """A route that curls tightly around the ego overflows the near tiles'
    sorted-prefix capacity (raster.NEAR_THR2 counts > NEAR_PREFIX) and must
    take the rolled full-loop fallback — parity must hold there too."""
    t = np.linspace(0, 6 * np.pi, 120)
    r = 7.0  # whole circle inside the 14.6 m near threshold
    wps = np.stack([r * np.cos(t), r * np.sin(t)], 1).astype(np.float32)
    spec = jax.tree.map(jnp.asarray, build_world_spec({
        "id": 9, "town": "T", "waypoints": wps, "scenarios": [],
        "weather": [0, 0, 0, 90]}))
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(0))
    st = st.replace(ego=st.ego.replace(pos=jnp.asarray([r, 0.0]),
                                       route_idx=jnp.asarray(40, jnp.int32)))
    cam, fwd, right = R._camera_basis(st.ego.pos, st.ego.yaw)
    boxes = jnp.concatenate(
        [R._collect_actor_boxes(st, cam, fwd, right), R._signal_boxes(spec, st, cam, fwd, right)]
    )
    weather = R.weather_now(spec, st)
    cam_scalars, _, _ = R._pallas_inputs(spec, st, cam, fwd, right, boxes, weather)
    # the scenario of interest: the tightest near class genuinely overflows
    from gabril_carla_tpu.ops.pallas_raster import NEAR_PREFIX
    assert float(cam_scalars[11]) > NEAR_PREFIX[0]
    _assert_kernel_matches_oracle(spec, st)


def test_pallas_box_prefix_branches():
    """Crowded scene exercises the >24-boxes composite branch; the ordinary
    scene exercises the <=12 branch (both must match the oracle)."""
    spec, st = scene()
    veh = st.vehicles
    n = veh.pos.shape[0]
    # drop a grid of live vehicles right in front of the camera
    k = min(n, 30)
    gx = 12.0 + 4.0 * (np.arange(k) % 6)
    gy = -6.0 + 2.5 * (np.arange(k) // 6)
    pos = np.asarray(veh.pos).copy()
    pos[:k] = np.stack([gx, gy], 1)
    alive = np.asarray(veh.alive).copy()
    alive[:k] = True
    wk = st.walkers
    nw = min(wk.pos.shape[0], 6)
    wpos = np.asarray(wk.pos).copy(); wpos[:nw] = np.stack(
        [14.0 + 3.0 * np.arange(nw), np.full(nw, 3.0)], 1)
    walive = np.asarray(wk.alive).copy(); walive[:nw] = True
    st = st.replace(vehicles=veh.replace(pos=jnp.asarray(pos), alive=jnp.asarray(alive)),
                    walkers=wk.replace(pos=jnp.asarray(wpos), alive=jnp.asarray(walive)))
    cam, fwd, right = R._camera_basis(st.ego.pos, st.ego.yaw)
    boxes = jnp.concatenate(
        [R._collect_actor_boxes(st, cam, fwd, right), R._signal_boxes(spec, st, cam, fwd, right)]
    )
    weather = R.weather_now(spec, st)
    cam_scalars, _, _ = R._pallas_inputs(spec, st, cam, fwd, right, boxes, weather)
    assert float(cam_scalars[15]) > 24
    _assert_kernel_matches_oracle(spec, st)


def test_flowless_route_engages_tile6_prefix():
    """With no enabled flow, the flow endpoint rows must NOT be force-ranked
    into the sort front: the valid-row count stays <= ROUTE_VIEW so the
    kernel's 128-row tile-6 prefix (its common case) engages, and the near
    counts are not inflated by two phantom rows."""
    wps = np.stack([np.arange(0.0, 200.0, 2.0), np.zeros(100)], 1).astype(np.float32)
    spec = jax.tree.map(jnp.asarray, build_world_spec({
        "id": 3, "town": "T", "waypoints": wps, "scenarios": [],
        "weather": [0, 0, 0, 90]}, ambient=False))
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(0))
    cam, fwd, right = R._camera_basis(st.ego.pos, st.ego.yaw)
    boxes = jnp.concatenate(
        [R._collect_actor_boxes(st, cam, fwd, right), R._signal_boxes(spec, st, cam, fwd, right)]
    )
    weather = R.weather_now(spec, st)
    cam_scalars, _, _ = R._pallas_inputs(spec, st, cam, fwd, right, boxes, weather)
    assert not bool(spec.flow_enabled[0])
    assert float(cam_scalars[14]) <= 128.0, cam_scalars[11:15]
    _assert_kernel_matches_oracle(spec, st)


def test_enabled_flow_still_forces_endpoints():
    """With a live crossing flow the endpoint force-rank must survive: the
    first flow row ranks into every prefix (key -0.6 < all thresholds)."""
    wps = np.stack([np.arange(0.0, 200.0, 2.0), np.zeros(100)], 1).astype(np.float32)
    spec = jax.tree.map(jnp.asarray, build_world_spec({
        "id": 4, "town": "T", "waypoints": wps, "weather": [0, 0, 0, 90],
        "scenarios": [{"type": "CrossingBicycleFlow", "trigger": (40.0, 0.0, 0.0),
                       "start_actor_flow": (60.0, 30.0), "end_actor_flow": (60.0, -30.0),
                       "flow_speed": 8.0, "source_dist_interval": (10.0, 20.0)}]},
        ambient=False))
    env = DrivingEnv()
    st = env.reset(spec, jax.random.PRNGKey(0))
    cam, fwd, right = R._camera_basis(st.ego.pos, st.ego.yaw)
    boxes = jnp.concatenate(
        [R._collect_actor_boxes(st, cam, fwd, right), R._signal_boxes(spec, st, cam, fwd, right)]
    )
    weather = R.weather_now(spec, st)
    cam_scalars, cols, _ = R._pallas_inputs(spec, st, cam, fwd, right, boxes, weather)
    assert bool(spec.flow_enabled[0])
    # both forced flow endpoints rank inside every count
    assert float(cam_scalars[11]) >= 4.0  # 2 route + 2 flow endpoints minimum
    # a flow row (col6 >= ROUTE_VIEW) appears in the first handful of rows
    head_ids = np.asarray(cols[:8, 6])
    assert (head_ids >= R.ROUTE_VIEW).any()
