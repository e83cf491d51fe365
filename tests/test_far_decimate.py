"""Far-field route decimation (DESIGN §7b lever 3b, GABRIL_FAR_DECIMATE).

Contract: beyond 40 m every other 1 m route row is biased out of the
terrain argmin so the kernel's deep prefixes shrink. The tests bound what
it may change:

1. decimated Pallas kernel (interpret) == decimated XLA oracle — the two
   implementations stay in lockstep under the flag;
2. decimated vs baseline full render: differing pixels are FEW (<2%) and
   ALL beyond 35 m ground depth (horizon band) — the near field is
   bitwise identical;
3. host-side row accounting: dropped rows are exactly the odd-index >40 m
   non-endpoint route rows, the valid-row count shrinks accordingly, and
   window endpoints are never dropped.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gabril_carla_tpu.ops.raster as R
from gabril_carla_tpu.env import DrivingEnv
from gabril_carla_tpu.env.world import build_world_spec
from gabril_carla_tpu.ops.pallas_raster import (CAP3_DECIMATED, CX, CY, FX,
                                                CAM_Z, H, W,
                                                render_frame_pallas)


def scene():
    wps = np.stack([np.arange(0.0, 200, 2.0),
                    8 * np.sin(np.arange(100) * 0.06)], 1).astype(np.float32)
    spec = jax.tree.map(jnp.asarray, build_world_spec({
        "id": 1, "town": "T", "waypoints": wps,
        "scenarios": [{"type": "PedestrianCrossing", "trigger": (40.0, 0.5, 0.0)}],
        "weather": [5, 0, 2, 90]}))
    env = DrivingEnv()
    act = jnp.asarray([0.5, 0, 0, 0, 0, 0, 0])
    st, _ = jax.jit(
        lambda k: jax.lax.scan(lambda s, _: (env.step(spec, s, act), None),
                               env.reset(spec, k), None, length=40)
    )(jax.random.PRNGKey(0))
    return spec, st


def _parts(spec, st):
    cam, fwd, right = R._camera_basis(st.ego.pos, st.ego.yaw)
    boxes = jnp.concatenate([R._collect_actor_boxes(st, cam, fwd, right),
                             R._signal_boxes(spec, st, cam, fwd, right)])
    weather = R.weather_now(spec, st)
    return cam, fwd, right, boxes, weather


def test_decimated_kernel_matches_decimated_oracle():
    spec, st = scene()
    cam, fwd, right, boxes, weather = _parts(spec, st)
    oracle = np.asarray(R._render_frame_xla(spec, st, cam, fwd, right, boxes,
                                            weather, far_decimate=True))
    cs, cols, cb = R._pallas_inputs(spec, st, cam, fwd, right, boxes, weather,
                                    far_decimate=True)
    img = np.asarray(render_frame_pallas(cs, cols, cb, cols.shape[0], cb.shape[0],
                                         R.ROUTE_VIEW, interpret=True,
                                         far_decimate=True))
    d = np.abs(img - oracle)
    assert (d > 1e-3).mean() < 0.01
    assert np.median(d) < 1e-5


def test_decimation_changes_only_far_pixels():
    spec, st = scene()
    cam, fwd, right, boxes, weather = _parts(spec, st)
    base = np.asarray(R._render_frame_xla(spec, st, cam, fwd, right, boxes,
                                          weather, far_decimate=False))
    dec = np.asarray(R._render_frame_xla(spec, st, cam, fwd, right, boxes,
                                         weather, far_decimate=True))
    diff = np.abs(base - dec) > 1e-4
    # bounded: a few horizon pixels at most
    assert diff.mean() < 0.02, diff.mean()
    if diff.any():
        # every differing pixel's ground ray hits beyond 35 m
        v = np.nonzero(diff)[0].astype(np.float32)
        dv = np.maximum(v - CY, 1e-3)
        z = np.clip(CAM_Z * FX / dv, 0.0, 120.0)
        assert z.min() > 35.0, float(z.min())


def test_lower_window_matches_oracle():
    """Lever 3a: deep tile classes skip sorted rows below their z_min-6
    bound. The XLA oracle runs the FULL argmin, so this pins the
    containment argument — skipped rows never change a painted pixel
    beyond the same tolerance the upper prefixes already hold."""
    spec, st = scene()
    cam, fwd, right, boxes, weather = _parts(spec, st)
    oracle = np.asarray(R._render_frame_xla(spec, st, cam, fwd, right, boxes,
                                            weather))
    cs, cols, cb = R._pallas_inputs(spec, st, cam, fwd, right, boxes, weather)
    img = np.asarray(render_frame_pallas(cs, cols, cb, cols.shape[0], cb.shape[0],
                                         R.ROUTE_VIEW, interpret=True,
                                         lower_window=True))
    d = np.abs(img - oracle)
    assert (d > 1e-3).mean() < 0.01
    assert np.median(d) < 1e-5


def test_both_levers_compose():
    spec, st = scene()
    cam, fwd, right, boxes, weather = _parts(spec, st)
    oracle = np.asarray(R._render_frame_xla(spec, st, cam, fwd, right, boxes,
                                            weather, far_decimate=True))
    cs, cols, cb = R._pallas_inputs(spec, st, cam, fwd, right, boxes, weather,
                                    far_decimate=True)
    img = np.asarray(render_frame_pallas(cs, cols, cb, cols.shape[0], cb.shape[0],
                                         R.ROUTE_VIEW, interpret=True,
                                         far_decimate=True, lower_window=True))
    d = np.abs(img - oracle)
    assert (d > 1e-3).mean() < 0.01
    assert np.median(d) < 1e-5


def test_row_accounting_and_endpoint_exemption():
    spec, st = scene()
    cam, fwd, right, boxes, weather = _parts(spec, st)
    cs0, cols0, _ = R._pallas_inputs(spec, st, cam, fwd, right, boxes, weather,
                                     far_decimate=False)
    cs1, cols1, _ = R._pallas_inputs(spec, st, cam, fwd, right, boxes, weather,
                                     far_decimate=True)
    n0, n1 = float(cs0[14]), float(cs1[14])  # valid-row counts
    assert n1 < n0  # far rows were dropped
    # surviving valid rows fit the decimated class-3 cap (the static prefix
    # the kernel runs when the gate engages)
    assert n1 <= CAP3_DECIMATED + 0.5, n1
    # dropped rows carry the 1e12 bias and sorted to the tail; every
    # surviving route row with |q| > 40 m has an EVEN original index or is
    # the forced window endpoint
    cols1 = np.asarray(cols1)
    live = cols1[cols1[:, 2] < 1e11]
    route_rows = live[live[:, 6] < R.ROUTE_VIEW]
    far = route_rows[route_rows[:, 2] > R.FAR_DECIMATE_R2]
    j = far[:, 6].astype(int)
    n_valid_route = int(np.asarray(jnp.clip(
        spec.n_route - jnp.clip(st.ego.route_idx - R.ROUTE_BEHIND, 0,
                                spec.route_xy.shape[0] - R.ROUTE_VIEW),
        1, R.ROUTE_VIEW)))
    assert ((j % 2 == 0) | (j == n_valid_route - 1)).all()
