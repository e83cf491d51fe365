"""Closed-loop evaluation: lax.scan(policy ∘ render ∘ step), vmapped.

Subsumes the reference's per-route tick loop (leaderboard
scenarios/scenario_manager.py:161-226) and its agent plumbing
(eval/my_agents/bc_agent.py:307-413): one compiled graph runs policy
inference, rasterization, dynamics, scenario logic, and criteria per tick —
then vmap turns it into thousands of simultaneous routes per chip.

Parity details kept: 10 warm-up no-op ticks (bc_agent.py:404), hard stop at
fps*100 = 2000 ticks (bc_agent.py:407-411), frame ring buffer fed to the
policy exactly like training's frame stack, brake binarization in the codec.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..env.env import DrivingEnv
from ..ops.raster import analytic_gaze, confounded_overlay, render_frame
from ..utils.packing import make_carry_packer

WARMUP_STEPS = 10
HARD_STOP = 2000  # = fps * 100

# Pack the SceneState scan carry into one array per dtype (docs/DESIGN.md
# §7b lever 1). Measured OFF: the round-4 trace attributed the fused-loop
# floor to XLA while-loop copy-insertion over the ~59 small state leaves,
# but the on-chip A/B falsified the lever — packed 22.6k vs unpacked 23.8k
# steps/s at 256 worlds (reproduced twice), plus ~3x compile time: the
# carry copies were already overlapped with compute, while the per-
# iteration pack concatenate serializes on the critical path. Packing is
# reshape/concat only — bitwise identical rollouts, pinned by
# tests/test_packing.py — so GABRIL_PACK_CARRY=1 safely re-enables it for
# future A/Bs on other topologies.
_PACK_CARRY = os.environ.get("GABRIL_PACK_CARRY", "0").lower() not in ("", "0", "false", "no")


def make_rollout_fn(
    policy_fn,
    cfg,
    steps: int = HARD_STOP,
    use_analytic_gaze: bool = False,
    gaze_predictor_apply=None,
    confounded: bool = False,
    return_frames: bool = False,
):
    """Build rollout(spec, params, key) -> (final_state, aux).

    policy_fn(params, obs [1,H,W,S], heat [1,H,W,S]|None) -> [1, 7] action.
    gaze_predictor_apply(params['gaze_predictor'], obs) -> [1,H,W,1] heat
    (frozen predictor, train_gaze_predictor parity) when the method needs one.
    """
    s = cfg.data["frame_stack"]
    env = DrivingEnv()
    needs_heat = cfg.gaze["method"] in ("Mask", "ViSaRL", "AGIL") or cfg.dropout["method"] in (
        "GMD",
        "IGMD",
    )
    if needs_heat and gaze_predictor_apply is None and not use_analytic_gaze:
        # A heat-needing method evaluated with zero heat silently drives on an
        # all-black input (Mask) or garbage-averaged latents (AGIL). The
        # reference always runs the gaze predictor here (bc_agent.py:275-298),
        # so refuse instead of producing quietly wrong scores.
        raise ValueError(
            f"gaze method {cfg.gaze['method']!r} / dropout {cfg.dropout['method']!r} "
            "needs gaze heat at eval: pass gaze_predictor_apply (frozen predictor, "
            "bc_agent.py:275-298 parity) or set use_analytic_gaze=True"
        )
    heatmapper = None
    if needs_heat and gaze_predictor_apply is None:
        from ..ops.heatmap import GazeHeatmapper

        heatmapper = GazeHeatmapper(
            img_height=180, img_width=320,
            gaze_sigma=cfg.gaze.get("mask_sigma", 30.0),
            maxpoints=cfg.gaze.get("max_points", 5),
        )

    def init_carry(spec, key):
        state = env.reset(spec, key)
        frame = render_frame(spec, state)
        frames = jnp.repeat(frame[..., None], s, axis=-1)  # [H, W, S]
        return state, frames

    def compute_heat(spec, state, params, obs):
        if not needs_heat:
            return None
        if gaze_predictor_apply is not None:
            # frozen gaze predictor (bc_agent.py:275-298 parity); clamp to
            # [0,1] like the reference (bc_agent.py:277-278) — the UNet head
            # is an unbounded 1x1 conv
            pred = gaze_predictor_apply(params["gaze_predictor"], obs)  # [1,H,W,1]
            pred = jnp.clip(pred, 0.0, 1.0)
            return jnp.repeat(pred, s, axis=-1)
        # analytic gaze from the scene graph, splatted like training
        coords = analytic_gaze(spec, state, heatmapper.maxpoints)
        hm = heatmapper.heatmaps(coords[None])  # [1, H, W]
        return jnp.repeat(hm[..., None], s, axis=-1)

    def tick(carry, _, spec, params):
        state, frames = carry
        frame = render_frame(spec, state)
        frames = jnp.concatenate([frames[..., 1:], frame[..., None]], axis=-1)
        obs = frames[None]  # [1, H, W, S]

        heat = compute_heat(spec, state, params, obs)
        action = policy_fn(params, obs, heat)[0]
        if confounded:
            # two-pass predict -> overlay -> re-predict (bc_agent.py:321-352).
            # The overlaid frame persists in the ring buffer so older stack
            # entries keep their own-timestep overlays, matching both the
            # confounded training data and the reference's processed-frame
            # buffer (bc_agent.py:228-269).
            frame_ov = confounded_overlay(frame, action)
            frames = jnp.concatenate([frames[..., :-1], frame_ov[..., None]], axis=-1)
            obs2 = frames[None]
            heat2 = compute_heat(spec, state, params, obs2)
            action = policy_fn(params, obs2, heat2)[0]
        # warm-up no-ops: full brake (noop_control, autonomous_agent.py:194-206)
        noop = jnp.zeros(7).at[2].set(1.0)
        action = jnp.where(state.t < WARMUP_STEPS, noop, action)
        state = env.step(spec, state, action)
        out = frame if return_frames else state.ego.pos
        return (state, frames), out

    def rollout(spec, params, key):
        state, frames = init_carry(spec, key)
        if _PACK_CARRY:
            pack, unpack = make_carry_packer(state)  # shape/dtype metadata only

            def packed_tick(c, x):
                (st, fr), out = tick((unpack(c[0]), c[1]), x, spec, params)
                return (pack(st), fr), out

            (packed, _), trace = jax.lax.scan(
                packed_tick, (pack(state), frames), None, length=steps
            )
            return unpack(packed), trace
        (state, _), trace = jax.lax.scan(
            lambda c, x: tick(c, x, spec, params), (state, frames), None, length=steps
        )
        return state, trace

    return rollout


def rollout_routes(specs, params, rollout_fn, key, mesh=None):
    """vmap a rollout over a batch of WorldSpecs; optionally shard over 'data'."""
    n = jax.tree.leaves(specs)[0].shape[0]
    keys = jax.random.split(key, n)
    fn = jax.vmap(rollout_fn, in_axes=(0, None, 0))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        specs = jax.device_put(specs, NamedSharding(mesh, P("data")))
        fn = jax.jit(fn)
    return fn(specs, params, keys)
