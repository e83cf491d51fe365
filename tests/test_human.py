"""Human-collection components: controller mapping, gaze sources, headless loop."""

import numpy as np
import pytest

from gabril_carla_tpu.eval.human import GazeSource, KeyboardController


def test_keyboard_incremental_steer():
    c = KeyboardController(dt=0.05)
    for _ in range(5):
        a = c.action({"left": True})
    assert a[1] < -0.3  # steer accumulated left
    for _ in range(20):
        a = c.action({})
    assert abs(a[1]) < 1e-6  # returned to center
    a = c.action({"up": True, "down": True})
    assert a[0] > 0 and a[2] == 1.0


def test_gaze_sources():
    center = GazeSource("center")
    np.testing.assert_allclose(center.sample(), [0.5, 0.5])
    dummy = GazeSource("dummy", seed=1)
    p1, p2 = dummy.sample(), dummy.sample()
    assert not np.allclose(p1, p2)  # drifts
    assert np.all((p2 >= 0) & (p2 <= 1))
    mouse = GazeSource("mouse")
    np.testing.assert_allclose(mouse.sample((0.2, 0.7)), [0.2, 0.7])
    # out-of-window mouse holds last valid
    np.testing.assert_allclose(mouse.sample((1.4, 0.7)), [0.2, 0.7])


def test_headless_drive_loop(tmp_path, monkeypatch):
    pygame = pytest.importorskip("pygame")
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
    import jax
    import jax.numpy as jnp

    from gabril_carla_tpu.env.world import build_world_spec
    from gabril_carla_tpu.eval.human import HumanLoop

    wps = np.stack([np.arange(0.0, 60, 2.0), np.zeros(30)], 1).astype(np.float32)
    spec = jax.tree.map(jnp.asarray, build_world_spec(
        {"id": 77, "town": "T", "waypoints": wps, "scenarios": [], "weather": [0, 0, 0, 90]}))
    ep = HumanLoop(spec, tmp_path, gaze="center", display_scale=1).run(seed=1, max_steps=5)
    z = np.load(ep / "observations.npz")
    assert z["observations"].shape[0] == 5
    assert (tmp_path / "route_77" / "seed_1" / "stats.json").exists()

def test_joystick_mapping_parity():
    """JoystickController reproduces human_agent.py:296-309: 0.8*y throttle,
    -y brake, EMA steer under a 0.1 deadzone."""
    from gabril_carla_tpu.eval.human import JoystickController

    # defaults index the BUTTONS+AXES concatenated vector read() produces
    # (buttons first — the reference's get_current_controller_state layout),
    # so 16/19 land on the same wheel controls as the reference's defaults
    ctrl = JoystickController()
    axes = [0.0] * 20
    # full forward (reference inverts the throttle axis: y = -axes[19])
    axes[19] = -1.0
    a = ctrl.action(axes)
    assert a[0] == pytest.approx(0.8) and a[2] == 0.0
    # full brake
    axes[19] = 1.0
    a = ctrl.action(axes)
    assert a[0] == 0.0 and a[2] == pytest.approx(1.0)
    # steer EMA: one tick moves 1% toward the axis; inside deadzone resets to 0
    axes[19] = 0.0
    axes[16] = 1.0
    a = ctrl.action(axes)
    assert a[1] == pytest.approx(0.01)
    a = ctrl.action(axes)
    assert a[1] == pytest.approx(0.99 * 0.01 + 0.01)
    axes[16] = 0.05  # below deadzone
    a = ctrl.action(axes)
    assert a[1] == 0.0
    # short axis vectors (gamepads with < 20 axes) are zero-padded, not IndexError
    a = ctrl.action([0.0, 0.0])
    assert a.shape == (7,)


def test_joystick_attach_without_hardware_raises():
    import os

    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from gabril_carla_tpu.eval.human import JoystickController

    with pytest.raises(RuntimeError):
        JoystickController().attach()


def test_humanloop_rejects_unknown_controller(tmp_path):
    from gabril_carla_tpu.eval.human import HumanLoop

    with pytest.raises(ValueError):
        HumanLoop(None, tmp_path, controller="wheel")
