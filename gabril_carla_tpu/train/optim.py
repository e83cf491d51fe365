"""Optimizer + LR-schedule builders on optax.

Semantics map 1:1 to the reference's torch builders
(vlm_gaze/train/common/optim.py:11-107): adam/adamw; step, cosine (per-epoch),
cosine_warm_restarts, cosine_warmup (per-step linear warmup + cosine to
eta_min), onecycle, none. Schedules are expressed as functions of the update
step; per-epoch schedules quantize internally via steps_per_epoch.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def _schedule(cfg_sched, cfg_train, base_lr: float, steps_per_epoch: int, grad_accum: int = 1):
    kind = cfg_sched.get("type") or "none"
    epochs = cfg_train.get("epochs", 1)
    spe = max(1, steps_per_epoch // max(1, grad_accum))

    if kind == "none":
        return base_lr

    # NOTE: schedules are called with a traced step inside jit -> jnp math only.
    if kind == "step":
        # StepLR: lr * gamma^(epoch // step_size), stepped per epoch
        def fn(step):
            epoch = step // spe
            return base_lr * cfg_sched["gamma"] ** (epoch // cfg_sched["step_size"])

        return fn

    if kind == "cosine":
        eta_min = cfg_sched["eta_min"]

        def fn(step):
            epoch = step // spe
            frac = jnp.minimum(1.0, epoch / max(1, epochs))
            return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * frac))

        return fn

    if kind == "cosine_warm_restarts":
        t0 = float(cfg_sched["T_0"])
        tmult = float(max(1, cfg_sched.get("T_mult", 1)))
        eta_min = cfg_sched["eta_min"]

        def fn(step):
            # restart period measured in epochs, advanced per optimizer step
            e = step / spe
            if tmult == 1.0:
                start = jnp.floor(e / t0) * t0
                t_i = t0
            else:
                # closed form: n completed restarts with geometric periods
                n = jnp.floor(jnp.log(e / t0 * (tmult - 1.0) + 1.0) / jnp.log(tmult))
                start = t0 * (tmult**n - 1.0) / (tmult - 1.0)
                t_i = t0 * tmult**n
            frac = (e - start) / t_i
            return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * frac))

        return fn

    if kind == "cosine_warmup":
        total = max(1, (steps_per_epoch * epochs) // max(1, grad_accum))
        warm = cfg_sched["warmup_steps"]
        eta_min = cfg_sched["eta_min"]
        ratio = eta_min / max(1e-12, base_lr)

        def fn(step):
            warm_lr = base_lr * step / max(1, warm)
            prog = (step - warm) / max(1, total - warm)
            cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
            main_lr = base_lr * (ratio + (1 - ratio) * cosine)
            return jnp.where(step < warm, warm_lr, main_lr)

        return fn

    if kind == "onecycle":
        total = epochs * steps_per_epoch
        return optax.cosine_onecycle_schedule(
            transition_steps=total,
            peak_value=base_lr,
            pct_start=cfg_sched["pct_start"],
            div_factor=cfg_sched["div_factor"],
            final_div_factor=cfg_sched["final_div_factor"],
        )

    raise ValueError(f"Unknown scheduler type: {kind}")


def build_optimizer(cfg_opt, cfg_sched, cfg_train, steps_per_epoch: int) -> optax.GradientTransformation:
    """adam/adamw with the configured LR schedule, plus grad accumulation."""
    sched = _schedule(cfg_sched, cfg_train, cfg_opt["lr"], steps_per_epoch,
                      cfg_train.get("gradient_accumulation_steps", 1))
    kind = cfg_opt.get("type", "adam")
    wd = cfg_opt.get("weight_decay", 0.0)
    # Global-norm gradient clip ahead of the moment updates. The reference's
    # recipe is Adam 5e-4 at batch 2000-4000 (configs/train_bc.yaml); at this
    # repo's batch 128 the same lr is ~4x hotter per-sample, and one hot
    # step right after warmup was observed to kill the network into a
    # constant predictor (loss pinned at the action variance). clip=0 turns
    # it off.
    clip = float(cfg_opt.get("clip_norm", 1.0))
    clip_tx = optax.clip_by_global_norm(clip) if clip else optax.identity()
    if kind == "adam":
        # torch.optim.Adam couples L2 into the gradient BEFORE the moment
        # updates (unlike AdamW's decoupled decay), so decay must precede
        # scale_by_adam to match the reference numerics.
        tx = optax.chain(
            clip_tx,
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(sched),
        )
    elif kind == "adamw":
        tx = optax.chain(clip_tx, optax.adamw(sched, weight_decay=wd))
    else:
        raise ValueError(f"Unknown optimizer type: {kind}")
    accum = cfg_train.get("gradient_accumulation_steps", 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx
