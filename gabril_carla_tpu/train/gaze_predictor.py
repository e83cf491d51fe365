"""Gaze-predictor trainer: AutoEncoder(stacked frames) -> aggregated heatmap.

Parity: vlm_gaze/train/train_gaze_predictor.py:83-101 (MSE to the last-step
causally aggregated heatmap). The trained model is frozen at eval to supply
masks for ViSaRL/Mask/AGIL/GMD/IGMD (eval/my_agents/bc_agent.py:83-94).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.training.train_state import TrainState

from ..models import AutoEncoder, UNet
from ..ops.heatmap import GazeHeatmapper


def build_gaze_models(cfg):
    m = cfg.model
    dt = jnp.bfloat16 if cfg.get_path("training.compute_dtype", "float32") == "bfloat16" else jnp.float32
    # model.arch selects the predictor backbone: 'autoencoder' (default — the
    # reference's configured choice, train_gaze_predictor.py:45) or 'unet'
    # (the reference's 4-level UNet, models/gaze_predictor.py:6-78, which it
    # ships but does not wire into a default trainer either).
    arch = m.get("arch", "autoencoder")
    if arch == "unet":
        model = UNet(output_channels=1, dtype=dt)
    elif arch == "autoencoder":
        model = AutoEncoder(
            embedding_dim=m["embedding_dim"],
            num_hiddens=m["num_hiddens"],
            num_residual_layers=m["num_residual_layers"],
            num_residual_hiddens=m["num_residual_hiddens"],
            out_channels=1,
            dtype=dt,
        )
    else:
        raise ValueError(f"unknown gaze predictor arch {arch!r} "
                         "(expected 'autoencoder' or 'unet')")
    g = cfg.gaze
    heatmapper = GazeHeatmapper(
        img_height=cfg.data["img_height"],
        img_width=cfg.data["img_width"],
        gaze_sigma=g.get("sigma", g.get("mask_sigma", 30.0)),
        gaze_coeff=g.get("coeff", g.get("mask_coeff", 0.8)),
        maxpoints=g["max_points"],
        temporal_alpha=g.get("temporal_alpha", 0.7),
        temporal_mode=g.get("temporal_mode", "alpha_decay"),
        temporal_sigmas=g.get("temporal_sigmas"),
        temporal_coeffs=g.get("temporal_coeffs"),
        temporal_offset_start=g.get("temporal_offset_start", 0),
    )
    return model, heatmapper


def init_gaze_state(cfg, rng: jax.Array, tx) -> tuple[tuple[AutoEncoder, GazeHeatmapper], TrainState]:
    model, heatmapper = build_gaze_models(cfg)
    h, w = cfg.data["img_height"], cfg.data["img_width"]
    s = cfg.data["frame_stack"]
    per = 1 if cfg.model["grayscale"] else 3
    params = model.init(rng, jnp.zeros((1, h, w, s * per), jnp.float32))["params"]
    return (model, heatmapper), TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def gaze_loss_fn(params, model: AutoEncoder, heatmapper: GazeHeatmapper, cfg, batch):
    obs, target, _ = heatmapper.prepare_for_gaze_predictor(
        batch["obs_seq"],
        batch["gaze_seq"],
        frame_stack=cfg.data["frame_stack"],
        grayscale=cfg.model["grayscale"],
    )
    pred = model.apply({"params": params}, obs).astype(jnp.float32)
    loss = jnp.mean((pred - target) ** 2)
    return loss, {"loss": loss}


def make_gaze_train_step(model: AutoEncoder, heatmapper: GazeHeatmapper, cfg,
                         donate: bool = True, jit: bool = True,
                         axis_name: str | None = None):
    def step(state: TrainState, batch, rng: jax.Array):
        del rng
        (_, metrics), grads = jax.value_and_grad(
            lambda p: gaze_loss_fn(p, model, heatmapper, cfg, batch), has_aux=True
        )(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        return state.apply_gradients(grads=grads), metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())
