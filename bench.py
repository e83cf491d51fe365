"""Headline benchmark: rendered closed-loop env steps/sec on one chip.

Measures the full pipeline the reference runs at 20 steps/sec/server
(CARLA sync mode, vlm_gaze/eval/env_manager.py:91,430): rasterized 320x180
observation -> BC policy forward -> env step (dynamics + scenarios +
criteria + ambient traffic), vmapped over worlds. Baseline = 20 (BASELINE.md).

Worlds are the REAL 20 Bench2Drive benchmark routes (flows, parked statics,
signals, weather) tiled to n_worlds when the route XML is present; otherwise
synthetic sine routes. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "mode"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from gabril_carla_tpu.data.vendored import routes_path

ROUTES_XML = str(routes_path())  # vendored routes220.json.gz, reference XML fallback


def main() -> int:
    # The tunneled TPU backend hangs indefinitely (not errors) when its
    # relay is down; a hung bench is worse than a failed one for whoever
    # runs this as a gate. Watchdog: if device init hasn't completed in
    # 180 s, report and hard-exit non-zero (no JSON line — a fabricated
    # number would read as a perf regression).
    import threading

    ready = threading.Event()

    def _watchdog():
        if not ready.wait(180.0):
            print("bench: backend init exceeded 180s (TPU relay down?) — aborting",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    jax.devices()  # force backend init under the watchdog
    ready.set()

    from gabril_carla_tpu.env import DrivingEnv
    from gabril_carla_tpu.env.world import build_world_spec, load_benchmark_specs, stack_specs
    from gabril_carla_tpu.ops.raster import render_frame
    from gabril_carla_tpu.train.bc import build_bc_models, init_bc_params, make_bc_policy_fn
    from gabril_carla_tpu.utils import default_bc_config

    # Defaults are the best honest batch config for the metric (round-4
    # probe ladder, results_r4/perf_probe.jsonl): throughput is flat in
    # world count (23.5k@256 -> 24.0k@1024), and a 400-step timed window
    # quarters the timing noise of the old 100-step one.
    n_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    cfg = default_bc_config()
    cfg["gaze"]["method"] = "None"
    cfg["training"]["compute_dtype"] = "bfloat16"
    models = build_bc_models(cfg)
    params = init_bc_params(models, cfg, jax.random.PRNGKey(0))
    policy = make_bc_policy_fn(models, cfg)
    s = cfg.data["frame_stack"]

    if os.path.exists(ROUTES_XML) and "--synthetic" not in sys.argv:
        # the real benchmark worlds, tiled to the requested batch
        from gabril_carla_tpu.data.tasks import seen_routes, unseen_routes

        ids = seen_routes() + unseen_routes()
        base = load_benchmark_specs(ROUTES_XML, ids)
        reps = -(-n_worlds // len(ids))
        specs = jax.tree.map(lambda a: jnp.asarray(np.concatenate([a] * reps)[:n_worlds]), base)
        mode = "real_routes"
    else:
        # synthetic route batch (no external files needed)
        rng = np.random.default_rng(0)
        specs = []
        for i in range(n_worlds):
            t = np.linspace(0, 2 * np.pi, 150)
            curve = 30.0 * rng.standard_normal()
            wps = np.stack([300.0 * t / (2 * np.pi), curve * np.sin(t)], 1).astype(np.float32)
            specs.append(
                build_world_spec(
                    {"id": i, "town": "T", "waypoints": wps,
                     "scenarios": [{"type": "PedestrianCrossing", "trigger": (float(wps[20, 0]), float(wps[20, 1]), 0.0)}],
                     "weather": [0, 0, 0, 90]}
                )
            )
        specs = jax.tree.map(jnp.asarray, stack_specs(specs))
        mode = "synthetic"

    env = DrivingEnv()

    # Pre-flight: prove the Pallas kernel actually lowers on this chip before
    # tracing the full benchmark graph. Interpret-mode CI cannot catch Mosaic
    # lowering rejections (fori_loop unroll limits etc.); if the kernel fails
    # here, fall back to the XLA render path and still report a number.
    fallback = ""
    if jax.default_backend() == "tpu":
        try:
            spec0 = jax.tree.map(lambda a: a[0], specs)
            st0 = env.reset(spec0, jax.random.PRNGKey(0))
            np.asarray(jax.jit(render_frame)(spec0, st0))
        except Exception as e:  # noqa: BLE001 — any lowering/compile failure
            print(f"bench: Pallas render failed on this backend ({type(e).__name__}: "
                  f"{e}); falling back to XLA render path", file=sys.stderr, flush=True)
            os.environ["GABRIL_FORCE_XLA_RENDER"] = "1"
            fallback = "+xla_render_fallback"

    # Differential stage timing (ROADMAP perf item): the single-stage scans
    # overstate per-stage throughput because XLA hoists loop-invariant work,
    # so stage shares are measured by SUBTRACTION on the full fused loop:
    #   GABRIL_BENCH_SKIP_POLICY=1  render+step only (constant action)
    #   GABRIL_BENCH_SKIP_RENDER=1  policy+step only (frame = state-seeded fill)
    # Skip modes tag "mode" in the JSON so they can never pass as the
    # official number (the driver runs bench.py with a clean env).
    def _flag(name):  # '0'/'false'/'' all mean off (ADVICE r3)
        return os.environ.get(name, "0").lower() not in ("", "0", "false", "no")

    skip_policy = _flag("GABRIL_BENCH_SKIP_POLICY")
    skip_render = _flag("GABRIL_BENCH_SKIP_RENDER")
    # A non-default render block size is a perf probe, not the official
    # config — reflect it in the mode tag so its JSON can't pass as official.
    block_env = os.environ.get("GABRIL_RENDER_BLOCK", "")
    block_tag = ""
    if block_env:
        from gabril_carla_tpu.ops.pallas_raster import BLOCK_ROWS

        if int(block_env) != BLOCK_ROWS:
            block_tag = f"+block{int(block_env)}"

    # Frame ring buffer lives in the policy's compute dtype: under bf16 the
    # first conv casts its input to bf16 regardless (flax dtype promotion),
    # so storing bf16 is bit-identical for the policy while halving the
    # per-step ring-buffer copy and the policy's HBM input reads.
    fdt = jnp.bfloat16 if cfg["training"]["compute_dtype"] == "bfloat16" else jnp.float32
    # The ring is carried as a rotating TUPLE of [H,W] frames, stacked only
    # at the policy input — identical pixels to the old slice+concatenate of
    # a [H,W,S] buffer, but the rotation is a carry-leaf swap instead of a
    # strided-slice DMA over the whole buffer (docs/DESIGN.md §7b lever 2;
    # the trace showed ~166 slice-start DMAs/iteration from the old form).
    # GABRIL_BENCH_CONCAT_RING=1 restores the old form for A/B (mode-tagged).
    concat_ring = _flag("GABRIL_BENCH_CONCAT_RING")
    # Carry packing (docs/DESIGN.md §7b lever 1): collapse SceneState's ~59
    # carry leaves into one array per dtype. FALSIFIED on-chip: 22.6k packed
    # vs 23.8k unpacked at 256 worlds (reproduced), ~3x compile time — the
    # carry copies were already overlapped; the pack concatenate is not.
    # Bitwise identity (tests/test_packing.py); GABRIL_PACK_CARRY=1 re-runs
    # the probe (mode-tagged so it can't pass as the official number).
    pack_carry = _flag("GABRIL_PACK_CARRY")

    def one_world_step(spec, state, frames, params):
        if skip_render:
            # data-dependent fill keeps the frame un-hoistable and un-DCE-able
            frame = jnp.full((180, 320), jnp.sum(state.ego.pos) * 1e-6, fdt)
        else:
            frame = render_frame(spec, state).astype(fdt)
        if concat_ring:
            frames = jnp.concatenate([frames[..., 1:], frame[..., None]], axis=-1)
            obs = frames
        else:
            frames = frames[1:] + (frame,)
            obs = jnp.stack(frames, axis=-1)
        if skip_policy:
            action = jnp.array([0.3, 0.0, 0.0]) + 1e-9 * obs[0, 0, 0]
        else:
            action = policy(params, obs[None])[0]
        state = env.step(spec, state, action)
        return state, frames

    def run(specs, params, keys):
        states = jax.vmap(env.reset)(specs, keys)
        if concat_ring:
            frames0 = jnp.zeros((n_worlds, 180, 320, s), fdt)
        else:
            frames0 = tuple(jnp.zeros((n_worlds, 180, 320), fdt) for _ in range(s))

        if pack_carry:
            from gabril_carla_tpu.utils.packing import make_carry_packer

            pack, unpack = make_carry_packer(jax.tree.map(lambda a: a[0], states))

            def one_world_packed(spec, packed, frames, params):
                st, fr = one_world_step(spec, unpack(packed), frames, params)
                return pack(st), fr

            def body(carry, _):
                st, fr = jax.vmap(one_world_packed, in_axes=(0, 0, 0, None))(
                    specs, *carry, params)
                return (st, fr), None

            (packed, _), _ = jax.lax.scan(
                body, (jax.vmap(pack)(states), frames0), None, length=n_steps)
            return jax.vmap(unpack)(packed).ego.pos

        def body(carry, _):
            st, fr = carry
            st, fr = jax.vmap(one_world_step, in_axes=(0, 0, 0, None))(specs, st, fr, params)
            return (st, fr), None

        (states, _), _ = jax.lax.scan(body, (states, frames0), None, length=n_steps)
        return states.ego.pos

    keys = jax.random.split(jax.random.PRNGKey(0), n_worlds)
    run_j = jax.jit(run)
    np.asarray(run_j(specs, params, keys))  # compile + warm (forced D2H:
    # block_until_ready can return early through the axon tunnel)
    # GABRIL_BENCH_PROFILE=<dir>: capture a jax.profiler trace of the timed
    # loop (ROADMAP perf item: the fused loop runs below the stage-isolated
    # numbers; a real trace beats guessing). Off by default — tracing costs
    # a few percent and writes files.
    prof_dir = os.environ.get("GABRIL_BENCH_PROFILE", "")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            np.asarray(run_j(specs, params, keys))
        print(f"bench: profiler trace written to {prof_dir}", file=sys.stderr)
    t0 = time.perf_counter()
    np.asarray(run_j(specs, params, keys))
    dt = time.perf_counter() - t0

    steps_per_sec = n_worlds * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "rendered_env_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / 20.0, 1),
                "mode": mode + fallback + block_tag
                + ("+concat_ring" if concat_ring else "")
                + ("+packed_carry" if pack_carry else "")
                + ("+skip_policy" if skip_policy else "")
                + ("+skip_render" if skip_render else ""),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
