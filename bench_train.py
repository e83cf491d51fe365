"""Training-throughput benchmark: BC train-step samples/sec + MFU on one chip.

Measures the jitted BC train step at the reference's training config of
record (vlm_gaze/configs/train_bc.yaml:10-33: batch 2000, method Reg,
mask_sigma 30, AMP -> bf16 here; 320x180 grayscale stack-2 observations)
with the batch already device-resident — the same regime as the
device-resident epoch scan (train/device_data.py), where data loading costs
nothing per step. The reference publishes no training-throughput number
(BASELINE.md:3), so vs_baseline is null; the number is tracked round-over-
round (BENCH_TRAIN_r0N.json) alongside model-FLOPs utilization.

MFU = cost-analysis FLOPs of the compiled step / elapsed / chip peak.
Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "mfu_pct", "mode"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# bf16 peak FLOP/s by device kind (jax.devices()[0].device_kind). v5e from
# the public spec (197 bf16 TFLOP/s); same figure docs/DESIGN.md uses for
# the eval-policy MXU estimate.
PEAK_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def main() -> int:
    import threading

    ready = threading.Event()

    def _watchdog():  # same rationale as bench.py: a hung gate is worse than a failed one
        if not ready.wait(180.0):
            print("bench_train: backend init exceeded 180s (TPU relay down?) — aborting",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    ready.set()

    from gabril_carla_tpu.train.bc import init_bc_state, make_bc_train_step
    from gabril_carla_tpu.train.optim import build_optimizer
    from gabril_carla_tpu.utils import default_bc_config

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    cfg = default_bc_config()
    cfg["data"].update(batch_size=bs)
    cfg["gaze"].update(method="Reg", mask_sigma=30.0)
    cfg["training"].update(compute_dtype="bfloat16", donate=True)

    rng = jax.random.PRNGKey(0)
    tx = build_optimizer(cfg.optimizer, cfg.scheduler, cfg.training,
                         steps_per_epoch=100)
    models, state = init_bc_state(cfg, rng, tx)
    step = make_bc_train_step(models, cfg, donate=True, jit=True)

    s = cfg.data["frame_stack"]
    h, w = cfg.data["img_height"], cfg.data["img_width"]
    p = cfg.gaze["max_points"]
    host = np.random.default_rng(0)
    batch = {
        "obs_seq": jnp.asarray(host.integers(0, 255, (bs, s, h, w, 1), dtype=np.uint8)),
        "gaze_seq": jnp.asarray(host.random((bs, s, p * 2), dtype=np.float32)),
        "actions": jnp.asarray(host.random((bs, cfg.data["action_dim"]), dtype=np.float32)),
    }

    key = jax.random.PRNGKey(1)
    # AOT: compile once, read model FLOPs from XLA's cost analysis
    lowered = step.lower(state, batch, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_per_step = float(ca.get("flops", 0.0))

    # Forced D2H instead of block_until_ready: through the axon tunnel
    # block_until_ready can return before device execution finishes (same
    # workaround as bench.py) — the first on-chip run timed dispatch, not
    # execution, and reported a 65x-over-peak "MFU".
    def _sync(st):
        np.asarray(jax.tree.leaves(st.params)[0])

    state, _ = step(state, batch, key)  # warm (donated: state must thread)
    _sync(state)

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    _sync(state)
    dt = time.perf_counter() - t0

    samples_per_sec = bs * iters / dt
    peak = PEAK_BF16.get(dev.device_kind)
    mfu = (flops_per_step * iters / dt / peak * 100.0) if peak else None
    print(json.dumps({
        "metric": "train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": None,  # reference publishes no training throughput
        "mfu_pct": round(mfu, 1) if mfu is not None else None,
        "flops_per_step": flops_per_step,
        "step_ms": round(dt / iters * 1e3, 2),
        "mode": f"bs{bs}_bf16_Reg_{dev.device_kind.replace(' ', '_')}",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
