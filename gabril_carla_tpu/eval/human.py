"""Interactive human data collection: pygame display + keyboard or joystick driving.

Parity with HumanAgent (eval/my_agents/human_agent.py:98-372): real-time
window at the render resolution, keyboard vehicle control with incremental
steering, per-tick gaze sampling from a pluggable source ('center' fixed,
'dummy' drifting point, 'mouse' cursor-as-gaze, 'gazepoint' eye tracker via
io.gazepoint), invalid-gaze hold-last-valid, and episode saving in the
dataset layout (observations/actions/gaze .npz).

The control mapping and gaze sources are pure and unit-testable; only
`HumanLoop.run` touches pygame (SDL_VIDEODRIVER=dummy works for headless
smoke tests).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np


class KeyboardController:
    """Incremental keyboard -> 7-action control (human_agent.py keyboard map)."""

    def __init__(self, steer_rate: float = 1.6, steer_return: float = 2.5, dt: float = 0.05):
        self.steer = 0.0
        self.steer_rate = steer_rate
        self.steer_return = steer_return
        self.dt = dt

    def action(self, keys: dict) -> np.ndarray:
        left, right = keys.get("left", False), keys.get("right", False)
        if left and not right:
            self.steer = max(-1.0, self.steer - self.steer_rate * self.dt)
        elif right and not left:
            self.steer = min(1.0, self.steer + self.steer_rate * self.dt)
        else:  # return to center
            mag = max(0.0, abs(self.steer) - self.steer_return * self.dt)
            self.steer = math.copysign(mag, self.steer)
        throttle = 0.8 if keys.get("up", False) else 0.0
        brake = 1.0 if keys.get("down", False) else 0.0
        reverse = 1.0 if keys.get("reverse", False) else 0.0
        return np.asarray([throttle, self.steer, brake, 0.0, reverse, 0.0, 0.0], np.float32)


class JoystickController:
    """Wheel/gamepad axes -> 7-action control (human_agent.py:255-309 parity).

    The reference's JoystickControl maps steering from one input and a
    signed throttle/brake input: throttle = 0.8*y for y>0, brake = -y for
    y<=0, and smooths steering with an EMA (new = 0.99*cache + 0.01*x)
    under a 0.1 deadzone. Its indices address the BUTTONS+AXES concatenated
    vector — get_current_controller_state appends buttons first, then axes
    — and `read()` returns the same concatenation here, so the default
    indices (16 steer, 19 inverted throttle) land on the same physical
    controls as the reference's wheel (ADVICE r4: an axes-only vector would
    silently shift them on any device with buttons). Indices are
    configurable per device. The mapping is a pure function of the input
    vector so it is unit-testable without hardware; `read()` pulls it from
    the first pygame joystick.
    """

    def __init__(self, steer_axis: int = 16, throttle_axis: int = 19,
                 deadzone: float = 0.1, smooth: float = 0.99):
        self.steer_axis = steer_axis
        self.throttle_axis = throttle_axis
        self.deadzone = deadzone
        self.smooth = smooth
        self.steer = 0.0
        self.joystick = None

    def attach(self):
        """Init pygame joystick 0; raises RuntimeError when none present
        (the reference exits; a loud error is kinder in a library)."""
        import pygame

        pygame.joystick.init()
        if pygame.joystick.get_count() == 0:
            raise RuntimeError("no joystick detected — use controller='keyboard'")
        self.joystick = pygame.joystick.Joystick(0)
        self.joystick.init()
        return self.joystick.get_name()

    def read(self) -> list:
        """Buttons then axes, concatenated — the reference's
        get_current_controller_state layout, which its default indices
        16/19 are calibrated against."""
        import pygame

        pygame.event.pump()
        return ([float(self.joystick.get_button(b))
                 for b in range(self.joystick.get_numbuttons())]
                + [self.joystick.get_axis(a)
                   for a in range(self.joystick.get_numaxes())])

    def action(self, axes) -> np.ndarray:
        n = max(self.steer_axis, self.throttle_axis) + 1
        axes = list(axes) + [0.0] * (n - len(axes))
        x = axes[self.steer_axis]
        y = -axes[self.throttle_axis]
        throttle = 0.8 * y if y > 0 else 0.0
        brake = -y if y <= 0 else 0.0
        self.steer = (self.smooth * self.steer + (1.0 - self.smooth) * x
                      if abs(x) > self.deadzone else 0.0)
        return np.asarray([throttle, self.steer, brake, 0.0, 0.0, 0.0, 0.0], np.float32)


class GazeSource:
    """'center' | 'dummy' | 'mouse' | 'gazepoint' -> [0,1]^2 with hold-last-valid."""

    def __init__(self, kind: str = "center", seed: int = 0):
        self.kind = kind
        self.rng = np.random.default_rng(seed)
        self.pos = np.asarray([0.5, 0.5])
        self.client = None
        if kind == "gazepoint":
            from ..io import GazepointClient

            self.client = GazepointClient()

    def sample(self, mouse_xy01=None) -> np.ndarray:
        if self.kind == "center":
            return np.asarray([0.5, 0.5])
        if self.kind == "dummy":  # drifting point (human_agent.py:180-199)
            self.pos = np.clip(self.pos + self.rng.normal(0, 0.02, 2), 0.05, 0.95)
            return self.pos.copy()
        if self.kind == "mouse" and mouse_xy01 is not None:
            x, y = mouse_xy01
            if 0.0 <= x <= 1.0 and 0.0 <= y <= 1.0:
                self.pos = np.asarray([x, y])
            return self.pos.copy()
        if self.client is not None:
            x, y, valid = self.client.poll()
            if valid:
                self.pos = np.asarray([x, y])
            return self.pos.copy()
        return self.pos.copy()


class HumanLoop:
    """Real-time drive-and-record loop."""

    def __init__(self, spec, out_dir: str | Path, gaze: str = "mouse",
                 display_scale: int = 3, fps: float = 20.0, max_points: int = 5,
                 controller: str = "keyboard"):
        if controller not in ("keyboard", "joystick"):  # human_agent.py:120
            raise ValueError(f"controller must be 'keyboard' or 'joystick', got {controller!r}")
        self.spec = spec
        self.out = Path(out_dir)
        self.gaze = GazeSource(gaze)
        self.scale = display_scale
        self.fps = fps
        self.max_points = max_points
        self.controller = controller

    def run(self, seed: int = 0, max_steps: int = 12000) -> Path:
        import pygame
        import jax
        import jax.numpy as jnp

        from ..env import DrivingEnv
        from ..env.criteria import compute_score
        from ..ops.raster import render_frame
        from .stats import route_record, write_stats_json

        env = DrivingEnv()
        step_j = jax.jit(lambda s, a: env.step(self.spec, s, a))
        render_j = jax.jit(lambda s: render_frame(self.spec, s))
        state = env.reset(self.spec, jax.random.PRNGKey(seed))

        pygame.init()
        w, h = 320 * self.scale, 180 * self.scale
        screen = pygame.display.set_mode((w, h))
        pygame.display.set_caption("gabril_carla_tpu — drive (arrows; q to quit+save)")
        clock = pygame.time.Clock()
        if self.controller == "joystick":
            ctrl = JoystickController()
            print(f"joystick: {ctrl.attach()}")
        else:
            ctrl = KeyboardController()

        obs_log, act_log, gaze_log = [], [], []
        running = True
        while running and len(obs_log) < max_steps and not bool(state.done):
            for ev in pygame.event.get():
                if ev.type == pygame.QUIT or (ev.type == pygame.KEYDOWN and ev.key == pygame.K_q):
                    running = False
            mx, my = pygame.mouse.get_pos()
            gaze = self.gaze.sample((mx / max(w - 1, 1), my / max(h - 1, 1)))

            frame = np.asarray(render_j(state))  # [180, 320]
            if self.controller == "joystick":
                action = ctrl.action(ctrl.read())
            else:
                pressed = pygame.key.get_pressed()
                keys = {"up": pressed[pygame.K_UP], "down": pressed[pygame.K_DOWN],
                        "left": pressed[pygame.K_LEFT], "right": pressed[pygame.K_RIGHT],
                        "reverse": pressed[pygame.K_r]}
                action = ctrl.action(keys)
            obs_log.append((frame * 255).astype(np.uint8))
            g = np.full((self.max_points, 2), -1.0, np.float32)
            g[0] = gaze
            gaze_log.append(g.reshape(-1))
            act_log.append(action)
            state = step_j(state, jnp.asarray(action))

            surf = pygame.surfarray.make_surface(
                np.repeat((frame.T[:, :, None] * 255).astype(np.uint8), 3, axis=2)
            )
            screen.blit(pygame.transform.scale(surf, (w, h)), (0, 0))
            pygame.draw.circle(screen, (255, 60, 60), (int(gaze[0] * w), int(gaze[1] * h)), 6, 2)
            pygame.display.flip()
            clock.tick(self.fps)
        pygame.quit()

        rid = int(np.asarray(self.spec.route_id))
        ep = self.out / f"route_{rid}" / f"seed_{seed}"
        ep.mkdir(parents=True, exist_ok=True)
        obs = np.stack(obs_log)[..., None].repeat(3, -1)
        np.savez_compressed(ep / "observations.npz", observations=obs)
        np.savez_compressed(ep / "actions.npz", actions=np.stack(act_log))
        np.savez_compressed(ep / "gaze.npz", gaze=np.stack(gaze_log))
        rec = route_record(rid, seed, compute_score(self.spec, state),
                           duration_game=len(obs_log) * 0.05,
                           route_length=float(self.spec.route_len))
        write_stats_json(self.out, rec)
        print(f"saved {len(obs_log)} ticks, score {rec['scores']['score_composed']:.1f} -> {ep}")
        return ep
