"""Full Bench2Drive-TPU benchmark: expert data -> BC/GABRIL -> driving scores.

Reproduces the reference's experimental protocol (BASELINE.md) end-to-end on
one chip: collect expert demonstrations on the 10 seen routes, train method
variants, evaluate closed-loop on the seen and unseen splits (seed 400
protocol), and write stats.json trees + an aggregate report.

Usage:
    nohup python -u examples/full_benchmark.py --out results/ &
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from gabril_carla_tpu.data import BCDataset, EpisodeStore, seen_routes, unseen_routes
    from gabril_carla_tpu.env import DrivingEnv
    from gabril_carla_tpu.env.criteria import compute_score
    from gabril_carla_tpu.env.expert import expert_action
    from gabril_carla_tpu.env.world import load_benchmark_specs
    from gabril_carla_tpu.eval.rollout import make_rollout_fn
    from gabril_carla_tpu.eval.stats import aggregate_scores, route_record, write_stats_json
    from gabril_carla_tpu.ops.raster import analytic_gaze, render_frame
    from gabril_carla_tpu.train import Trainer
    from gabril_carla_tpu.train.bc import make_bc_policy_fn
    from gabril_carla_tpu.utils import default_bc_config

    p = argparse.ArgumentParser()
    p.add_argument("--routes_xml", default=None)
    p.add_argument("--junction_traffic", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="ambient junction crossing traffic in collection AND eval worlds "
                        "(env/world.py flow-slot-0 synthesis); DEFAULT ON since round 5 "
                        "(docs/DEFAULTS_R5.md §1); --no-junction_traffic restores the "
                        "junction-free env of the r3/r4 anchors (their caches differ)")
    p.add_argument("--train_seeds", type=int, nargs="*", default=list(range(200, 212)))
    p.add_argument("--eval_seeds", type=int, nargs="*", default=[400, 401])
    p.add_argument("--collect_steps", type=int, default=900)
    p.add_argument("--eval_steps", type=int, default=1600)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--methods", nargs="*", default=["None", "Reg"],
                   help="gaze methods; append :dropout and @lambda, e.g. Reg@1.0 None:GMD")
    p.add_argument("--out", default="results")
    p.add_argument("--train_seed", type=int, nargs="+", default=[42],
                   help="training seeds (init + batch order); multiple seeds run in ONE "
                        "process so the multi-GB device upload happens once — through "
                        "this machine's TPU tunnel each upload costs 5-15 min")
    p.add_argument("--store_cache", default=None, help="npz path to save/load collected episodes")
    p.add_argument("--confounded", action="store_true",
                   help="bake expert-action overlays into training frames and evaluate with the "
                        "two-pass confounded protocol (build_confunded_obs.py + bc_agent.py:321-352)")
    p.add_argument("--sparse_gaze", action="store_true",
                   help="table-3 control: replace the dense analytic gaze with a sparse "
                        "human-like signal — sole top-hazard fixation, no road point, ~35%% "
                        "of frames dropped (eye-tracker validity statistics)")
    p.add_argument("--human_gaze", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="eye-tracker-statistics gaze: one fixation that HOLDS its screen "
                        "position between lognormal-duration saccades, with landing/drift "
                        "noise and ~35%% dropout frames (gaze_stats.humanize_gaze_coords). "
                        "DEFAULT ON since round 5 (docs/DEFAULTS_R5.md §2 — the "
                        "statistics-matched instrument); --no-human_gaze restores the "
                        "dense analytic oracle stream; gaze-free BC is untouched either way")
    p.add_argument("--misperceive_gaze", action="store_true",
                   help="SEMANTIC gaze-error rung (ladder rung 4): the full "
                        "eye-tracker statistics of --human_gaze PLUS "
                        "misperception — attention lapses parking gaze on "
                        "the road and wrong-actor fixations biased toward "
                        "actors near the true hazard "
                        "(gaze_stats.misperceive_gaze_coords)")
    p.add_argument("--curvature_gaze", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="collect analytic gaze with curvature-anticipating "
                        "(tangent-point) road fixations instead of the fixed "
                        "15 m preview; only affects a FRESH collection — a "
                        "loaded --store_cache keeps its recorded gaze")
    p.add_argument("--gp_arch", default="unet",
                   choices=["autoencoder", "unet"],
                   help="gaze-predictor backbone for heat-needing methods; "
                        "DEFAULT unet since round 5 (docs/DEFAULTS_R5.md §3) "
                        "(the reference ships a UNet it never wires; "
                        "model.arch=unet trains it for comparison)")
    p.add_argument("--clip_norm", type=float, default=None,
                   help="override optimizer.clip_norm (0 disables; de-confounds the "
                        "lambda ablation from gradient clipping)")
    args = p.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    env = DrivingEnv()
    seen = seen_routes()
    unseen = unseen_routes()
    all_specs = load_benchmark_specs(args.routes_xml, seen + unseen,
                                     junction_traffic=args.junction_traffic)
    all_specs = jax.tree.map(jnp.asarray, all_specs)
    idx_of = {r: i for i, r in enumerate(seen + unseen)}

    # ---------- 1. collect expert data on seen routes (one compile, reuse)
    @jax.jit
    def collect(spec, key):
        def tick(state, _):
            frame = render_frame(spec, state)
            gaze = analytic_gaze(
                spec, state, curvature_anticipation=args.curvature_gaze)
            action = expert_action(spec, state)
            state = env.step(spec, state, action)
            return state, (frame, action, gaze)

        state, outs = jax.lax.scan(tick, env.reset(spec, key), None, length=args.collect_steps)
        frames_u8 = (outs[0] * 255.0).astype(jnp.uint8)
        return state, frames_u8, outs[1], outs[2]

    t0 = time.time()
    store = EpisodeStore()
    expert_records = []
    cache = Path(args.store_cache) if args.store_cache else None
    if cache is not None and cache.exists():
        z = np.load(cache, allow_pickle=True)
        bounds = np.cumsum(z["lengths"])[:-1]
        for img, gz, ac in zip(np.split(z["images"], bounds), np.split(z["gazes"], bounds),
                               np.split(z["actions"], bounds)):
            store.add(img, gz, ac)
        expert_records = list(z["records"]) if "records" in z else []
        print(f"[collect] loaded {len(store.images)} episodes from {cache}", flush=True)
    collect_routes = [] if store.n_demos else seen
    for r in collect_routes:
        spec = jax.tree.map(lambda a: a[idx_of[r]], all_specs)
        for s in args.train_seeds:
            state, frames, actions, gazes = collect(spec, jax.random.PRNGKey(s * 1000 + r))
            n = int(np.asarray(state.t))
            store.add(np.asarray(frames[:n])[..., None], np.asarray(gazes[:n]), np.asarray(actions[:n]))
            sc = compute_score(spec, state)
            expert_records.append(route_record(r, s, sc, duration_game=n * 0.05,
                                               route_length=float(spec.route_len)))
        done = [rec for rec in expert_records if rec["route_id"].endswith(str(r))]
        print(f"[collect] route {r}: {len(args.train_seeds)} seeds, "
              f"expert score {np.mean([d['scores']['score_composed'] for d in done]):.1f}", flush=True)
    n_frames = int(sum(len(x) for x in store.images))
    expert_agg = aggregate_scores(expert_records) if expert_records else {"mean": -1.0}
    print(f"[collect] {n_frames} frames over {store.n_demos} episodes in "
          f"{time.time()-t0:.0f}s; expert mean {expert_agg['mean']:.2f}", flush=True)
    if cache is not None and not cache.exists():
        store.finalize()
        np.savez(cache, images=store.flat_images, gazes=store.flat_gazes,
                            actions=store.flat_actions, lengths=store.lengths,
                            records=np.asarray(expert_records, dtype=object))
        print(f"[collect] cached to {cache}", flush=True)

    # ---------- 1a'. sparse-gaze variant (table-3 control): the reference's
    # rising ratio curve rides sparse human/VLM gaze; the dense analytic gaze
    # (road fixation every frame) saturates at 25% of frames. This keeps one
    # top-hazard fixation per frame and drops ~35% of frames entirely.
    if args.sparse_gaze or args.human_gaze or args.misperceive_gaze:
        from gabril_carla_tpu.data.gaze_stats import (humanize_gaze_coords,
                                                      misperceive_gaze_coords,
                                                      sparsify_gaze_coords)

        store.finalize()
        # Dropout mask seeded from the first training seed: the sparse gaze
        # is a dataset-level artifact (like one recorded eye-tracker session)
        # shared by the seeds of THIS run, but distinct across suite
        # invocations with different seed lists (ADVICE r3: don't reuse one
        # fixed pattern for every variant).
        # precedence: the two EXPLICIT store_true flags (misperceive, sparse)
        # beat the default-ON human_gaze — since round 5 flipped human_gaze's
        # default, a --sparse_gaze invocation (the table-3 control, r3/r4
        # suite scripts) must still get sparsify, not the human branch
        if args.misperceive_gaze:
            g = misperceive_gaze_coords(store.flat_gazes, lengths=store.lengths,
                                        seed=args.train_seed[0])
            tag = "misperceive_gaze"
        elif args.sparse_gaze:
            g = sparsify_gaze_coords(store.flat_gazes, seed=args.train_seed[0])
            tag = "sparse_gaze"
        else:
            g = humanize_gaze_coords(store.flat_gazes, lengths=store.lengths,
                                     seed=args.train_seed[0])
            tag = "human_gaze"
        valid = (g[:, 0] >= 0).mean()
        print(f"[{tag}] {100*valid:.0f}% of frames keep one fixation "
              f"(mask seed {args.train_seed[0]})", flush=True)

    # ---------- 1a. confounded variant: overlay recorded actions onto frames
    if args.confounded:
        # numpy overlay (confounded_overlay math: brake dot + steering bar),
        # host-side to avoid shuttling the 3 GB frame buffer over the device link
        store.finalize()
        t0 = time.time()
        imgs = store.flat_images  # [T, H, W, 1] uint8
        acts = store.flat_actions
        hh, ww = imgs.shape[1], imgs.shape[2]
        vv = np.arange(hh, dtype=np.float32)[:, None]
        uu = np.arange(ww, dtype=np.float32)[None, :]
        dot = ((uu - 0.92 * ww) ** 2 + (vv - 0.85 * hh) ** 2) < (0.03 * ww) ** 2
        bar_y = np.abs(vv - 0.92 * hh) < 0.015 * hh
        brake = acts[:, 2] > 0.8
        steer = np.clip(acts[:, 1], -1.0, 1.0)
        cxp = 0.5 * ww + steer * 0.2 * ww
        for i in range(len(imgs)):
            if brake[i]:
                imgs[i, :, :, 0][dot] = 255
            lo, hi = sorted((float(cxp[i]), 0.5 * ww))
            bar = bar_y & (uu > lo) & (uu < hi)
            imgs[i, :, :, 0][bar] = 242
        print(f"[confound] overlaid {len(imgs)} frames in {time.time()-t0:.0f}s", flush=True)

    # one device-resident copy of the dataset shared by every trainer and
    # every seed in this process (the 6 GB HBM upload happens once)
    from gabril_carla_tpu.train.device_data import DeviceData

    base_cfg = default_bc_config()
    shared_dd = DeviceData(store, frame_stack=base_cfg.data["frame_stack"],
                           grayscale_store=base_cfg.model["grayscale"])

    def parse_core(m):
        t = m.replace("!notemporal", "").split("%")[0].split("@")[0]
        meth, _, drop = t.partition(":")
        return meth, drop or "None"

    for train_seed in args.train_seed:
        run_seed(train_seed, args, out / f"seed{train_seed}" if len(args.train_seed) > 1 else out,
                 store, shared_dd, expert_agg, n_frames, parse_core,
                 seen, unseen, idx_of, all_specs)
    return 0


def run_seed(train_seed, args, out, store, shared_dd, expert_agg, n_frames,
             parse_core, seen, unseen, idx_of, all_specs):
    """Train + evaluate every method spec at one training seed."""
    import gc
    import time

    import jax
    import jax.numpy as jnp

    from gabril_carla_tpu.data import BCDataset
    from gabril_carla_tpu.env.criteria import compute_score
    from gabril_carla_tpu.eval.rollout import make_rollout_fn
    from gabril_carla_tpu.eval.stats import aggregate_scores, route_record, write_stats_json
    from gabril_carla_tpu.train import Trainer
    from gabril_carla_tpu.train.bc import make_bc_policy_fn
    from gabril_carla_tpu.utils import default_bc_config

    out = Path(out)
    out.mkdir(parents=True, exist_ok=True)
    report = {"expert_seen_mean": expert_agg["mean"], "n_frames": n_frames,
              "confounded": args.confounded, "train_seed": train_seed, "methods": {}}

    # Suite-level resume: report.json is written after every completed cell,
    # so a relay death / preemption retry skips finished (method, seed)
    # cells instead of retraining them. A cell is only present in the report
    # once its train + both eval splits completed.
    report_path = out / "report.json"
    if report_path.exists():
        old = json.loads(report_path.read_text())
        if (old.get("confounded") == args.confounded
                and old.get("train_seed") == train_seed):
            report["methods"].update(old.get("methods", {}))
            done = [m for m in args.methods if m in report["methods"]]
            if done:
                print(f"[resume] skipping finished cells: {done}", flush=True)
    todo = [m for m in args.methods if m not in report["methods"]]

    # ---------- 1b. frozen gaze predictor for heat-needing methods
    # (train_gaze_predictor.py -> bc_agent.py:83-94 protocol)
    needs_gp = any(
        parse_core(m)[0] in ("Mask", "ViSaRL", "AGIL") or parse_core(m)[1] in ("GMD", "IGMD")
        for m in todo
    )
    gp_apply, gp_params = None, None
    if needs_gp:
        from gabril_carla_tpu.utils.config import default_gaze_config

        gcfg = default_gaze_config()
        gcfg["data"].update(batch_size=args.batch_size, task="GazePred")
        gcfg["model"]["arch"] = args.gp_arch
        gcfg["training"].update(epochs=max(10, args.epochs // 2), save_interval=999,
                                seed=train_seed)
        gcfg["scheduler"]["type"] = "none"
        gcfg["logging"]["log_dir"] = str(out / "runs")
        t0 = time.time()
        gtr = Trainer(gcfg, BCDataset(store, frame_stack=gcfg.data["frame_stack"]), mode="gaze", device_data=shared_dd)
        gm = gtr.train()
        gp_params = jax.device_get(gtr.state.params)
        gp_model = gtr.model
        gp_apply = lambda p, obs: gp_model.apply({"params": p}, obs)
        print(f"[train:gaze_predictor] {time.time()-t0:.0f}s: {gm}", flush=True)
        del gtr
        gc.collect()

    # ---------- 1c. VQ-VAE pretraining when any method uses Oreo dropout
    vqvae_path = ""
    if any(":" in m and m.split("@")[0].split(":")[1] == "Oreo" for m in todo):
        vcfg = default_bc_config()
        vcfg["data"].update(batch_size=args.batch_size, task="VQVAE")
        vcfg["training"].update(epochs=max(10, args.epochs // 2), save_interval=10**6,
                                seed=train_seed)
        vcfg["scheduler"]["type"] = "none"
        vcfg["logging"]["log_dir"] = str(out / "runs")
        t0 = time.time()
        vtr = Trainer(vcfg, BCDataset(store, frame_stack=vcfg.data["frame_stack"]), mode="vqvae", device_data=shared_dd)
        vm = vtr.train()
        vtr.save(epoch=0)
        vqvae_path = str(vtr.logger.ckpt_dir / "ep0")
        print(f"[train:vqvae] {time.time()-t0:.0f}s: {vm}", flush=True)
        del vtr
        gc.collect()

    # ---------- 2+3. train each method, evaluate on both splits
    for method_spec in todo:
        # spec grammar: Method[:Dropout][@lambda][%gaze_ratio][!notemporal]
        # e.g. Reg@1.0, None:GMD, Reg%0.5 (table-3 ratio), Reg!notemporal (table 4)
        method, lam, dropout, ratio, temporal = method_spec, None, "None", None, True
        if "!notemporal" in method:
            method = method.replace("!notemporal", "")
            temporal = False
        if "%" in method:
            method, ratio = method.split("%")
            ratio = float(ratio)
        if "@" in method:
            method, lam = method.split("@")
            lam = float(lam)
        if ":" in method:
            method, dropout = method.split(":")
        cfg = default_bc_config()
        cfg["data"].update(batch_size=args.batch_size, task="Mixed_")
        cfg["gaze"]["method"] = method
        cfg["dropout"]["method"] = dropout
        if dropout == "Oreo":
            cfg["dropout"]["vqvae_path"] = vqvae_path
        if lam is not None:
            cfg["gaze"]["lambda_weight"] = lam
        if ratio is not None:
            cfg["gaze"]["ratio"] = ratio
        cfg["gaze"]["temporal_flag"] = temporal
        if args.clip_norm is not None:
            cfg["optimizer"]["clip_norm"] = args.clip_norm
        tag = (method_spec.replace(":", "-").replace("@", "-l")
               .replace("%", "-r").replace("!", "-"))
        cfg["training"].update(epochs=args.epochs, save_interval=args.epochs,
                               seed=train_seed)
        cfg["logging"]["log_dir"] = str(out / "runs")
        gc.collect()  # drop the previous method's device-resident buffers
        trainer = Trainer(cfg, BCDataset(store, frame_stack=cfg.data["frame_stack"]), mode="bc", device_data=shared_dd)
        t0 = time.time()
        metrics = trainer.train()
        train_s = time.time() - t0
        print(f"[train:{method}] {args.epochs} epochs in {train_s:.0f}s: {metrics}", flush=True)

        policy = make_bc_policy_fn(trainer.models, cfg)
        # heat at eval: frozen gaze predictor when trained (reference
        # protocol), else the analytic scene-graph gaze
        roll = make_rollout_fn(lambda p, o, h=None: policy(p, o, h), cfg,
                               steps=args.eval_steps, use_analytic_gaze=True,
                               gaze_predictor_apply=gp_apply, confounded=args.confounded)
        eval_params = dict(trainer.state.params)
        if gp_params is not None:
            eval_params["gaze_predictor"] = gp_params
        roll_v = jax.jit(jax.vmap(roll, in_axes=(0, None, 0)))

        results = {}
        for split, routes in (("seen", seen), ("unseen", unseen)):
            pairs = [(r, s) for r in routes for s in args.eval_seeds]
            sel = np.asarray([idx_of[r] for r, _ in pairs])
            specs_b = jax.tree.map(lambda a: a[sel], all_specs)
            keys = jnp.stack([jax.random.PRNGKey(s * 100003 + r) for r, s in pairs])
            t0 = time.time()
            states, _ = roll_v(specs_b, eval_params, keys)
            states = jax.device_get(states)
            recs = []
            for i, (r, s) in enumerate(pairs):
                spec_i = jax.tree.map(lambda a: a[idx_of[r]], all_specs)
                st_i = jax.tree.map(lambda a: a[i], states)
                sc = compute_score(spec_i, st_i)
                rec = route_record(r, s, sc, duration_game=float(st_i.t) * 0.05,
                                   route_length=float(spec_i.route_len))
                write_stats_json(out / f"eval_{tag}_{split}", rec)
                recs.append(rec)
            agg = aggregate_scores(recs)
            results[split] = agg
            print(f"[eval:{method}:{split}] mean {agg['mean']:.2f} ± {agg['std']:.2f} "
                  f"({time.time()-t0:.0f}s, {len(pairs)} rollouts)", flush=True)
        # release this method's device-resident dataset before the next build
        # (two live copies at once is ~10 GB of the 16 GB HBM)
        trainer = policy = roll = roll_v = None
        gc.collect()
        report["methods"][method_spec] = {
            "train_seconds": round(train_s, 1),
            "final_loss": metrics,
            "seen": results["seen"]["mean"],
            "unseen": results["unseen"]["mean"],
            "per_route_seen": results["seen"]["per_route"],
            "per_route_unseen": results["unseen"]["per_route"],
        }
        (out / "report.json").write_text(json.dumps(report, indent=2))

    print(f"[done seed {train_seed}]",
          json.dumps({m: {k: v for k, v in d.items() if k in ("seen", "unseen")}
                      for m, d in report["methods"].items()}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
