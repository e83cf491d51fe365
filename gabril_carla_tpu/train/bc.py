"""Behavior-cloning train step: 7 gaze methods x 3 dropout methods, one graph.

Numeric contract: vlm_gaze/train/train_bc.py:203-299 (method dispatch,
ivg partial-gaze selection, mask composition, loss composition) and
train_bc.py:133-194 (regularization losses). Method/dropout choices are static
config, so dispatch happens at trace time; per-sample gaze participation (ivg)
is data-dependent and handled with weighted reductions instead of the
reference's boolean fancy-indexing (dynamic shapes don't jit).

Layouts are NHWC; the frame stack lives channel-last.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct
from flax.training.train_state import TrainState

from ..models import Actor, Encoder, PreActor, VectorQuantizer
from ..models.heads import MLP
from ..ops.gaze import gaze_mask_from_latent, gmd_dropout
from ..ops.heatmap import GazeHeatmapper


@struct.dataclass
class BCModels:
    """Static bundle of module definitions + preprocessing for BC training."""

    encoder: Encoder = struct.field(pytree_node=False)
    pre_actor: PreActor = struct.field(pytree_node=False)
    actor: Actor = struct.field(pytree_node=False)
    encoder_agil: Optional[Encoder] = struct.field(pytree_node=False)
    gril_head: Optional[MLP] = struct.field(pytree_node=False)
    quantizer: Optional[VectorQuantizer] = struct.field(pytree_node=False)
    heatmapper: GazeHeatmapper = struct.field(pytree_node=False)
    cfg: Any = struct.field(pytree_node=False)


def _dtype(cfg) -> jnp.dtype:
    return jnp.bfloat16 if cfg.get_path("training.compute_dtype", "float32") == "bfloat16" else jnp.float32


def build_bc_models(cfg) -> BCModels:
    m, g, d = cfg.model, cfg.gaze, cfg.dropout
    dt = _dtype(cfg)
    mk_enc = lambda: Encoder(
        embedding_dim=m["embedding_dim"],
        num_hiddens=m["num_hiddens"],
        num_residual_layers=m["num_residual_layers"],
        num_residual_hiddens=m["num_residual_hiddens"],
        dtype=dt,
    )
    heatmapper = GazeHeatmapper(
        img_height=cfg.data["img_height"],
        img_width=cfg.data["img_width"],
        gaze_sigma=g["mask_sigma"],
        gaze_coeff=g["mask_coeff"],
        maxpoints=g["max_points"],
        temporal_alpha=g.get("temporal_alpha", 0.7),
        temporal_mode=g.get("temporal_mode", "alpha_decay"),
        temporal_sigmas=g.get("temporal_sigmas"),
        temporal_coeffs=g.get("temporal_coeffs"),
        temporal_offset_start=g.get("temporal_offset_start", 0),
    )
    return BCModels(
        encoder=mk_enc(),
        pre_actor=PreActor(z_dim=m["z_dim"], dtype=dt),
        actor=Actor(action_dim=cfg.data["action_dim"], z_dim=m["z_dim"], dtype=dt),
        encoder_agil=mk_enc() if g["method"] == "AGIL" else None,
        gril_head=MLP(output_dim=g["max_points"] * 2, hidden_dim=m["z_dim"], hidden_depth=1, dtype=dt)
        if g["method"] == "GRIL"
        else None,
        quantizer=VectorQuantizer(m["embedding_dim"], d["num_embeddings"], 0.25)
        if d["method"] == "Oreo"
        else None,
        heatmapper=heatmapper,
        cfg=cfg.to_dict(),
    )


def encoder_input_channels(cfg) -> int:
    """coeff * S * (1|3), coeff=2 for ViSaRL (train_bc.py:60-61)."""
    coeff = 2 if cfg.gaze["method"] == "ViSaRL" else 1
    per = 1 if cfg.model["grayscale"] else 3
    return coeff * cfg.data["frame_stack"] * per


def init_bc_params(models: BCModels, cfg, rng: jax.Array) -> dict:
    h, w = cfg.data["img_height"], cfg.data["img_width"]
    s = cfg.data["frame_stack"]
    per = 1 if cfg.model["grayscale"] else 3
    cin = encoder_input_channels(cfg)
    k = jax.random.split(rng, 6)
    dummy = jnp.zeros((1, h, w, cin), jnp.float32)
    params = {"encoder": models.encoder.init(k[0], dummy)["params"]}
    z = models.encoder.apply({"params": params["encoder"]}, dummy)
    params["pre_actor"] = models.pre_actor.init(k[1], z)["params"]
    zf = models.pre_actor.apply({"params": params["pre_actor"]}, z)
    params["actor"] = models.actor.init(k[2], zf)["params"]
    if models.encoder_agil is not None:
        params["encoder_agil"] = models.encoder_agil.init(
            k[3], jnp.zeros((1, h, w, s * per), jnp.float32)
        )["params"]
    if models.gril_head is not None:
        params["gril_head"] = models.gril_head.init(k[4], zf)["params"]
    if models.quantizer is not None:
        params["quantizer"] = models.quantizer.init(k[5], z)["params"]
    return params


def init_bc_state(cfg, rng: jax.Array, tx) -> tuple[BCModels, TrainState]:
    models = build_bc_models(cfg)
    params = init_bc_params(models, cfg, rng)
    if models.quantizer is not None:
        # Oreo's quantizer is frozen (reference sets requires_grad=False,
        # train_bc.py:91-93); mask it out of the optimizer so weight decay
        # can't erode it despite the stop_gradient in the loss.
        import optax

        tx = optax.masked(tx, lambda p: {k: k != "quantizer" for k in p})
    state = TrainState.create(apply_fn=None, params=params, tx=tx)
    return models, state


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def _weighted_mean(per_sample: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Mean over selected samples; 0 if none selected (jit-safe ivg>0 indexing)."""
    tot = jnp.sum(w)
    return jnp.where(tot > 0, jnp.sum(per_sample * w) / jnp.maximum(tot, 1e-8), 0.0)


def _kl(a, b):
    return jnp.sum(a * jnp.log((a + 1e-6) / (b + 1e-6)), axis=(1, 2, 3))


def _reg_loss(models: BCModels, cfg, params, z, z_flat, gg, gc, xx, ivg, key):
    """Gaze regularization (train_bc.py:133-194). gg is [B, H, W, S]."""
    g = cfg.gaze
    method = g["method"]
    b = xx.shape[0]

    if method in ("Teacher", "Reg"):
        g1 = jax.lax.stop_gradient(gg[..., -1].astype(jnp.float32))  # [B,H,W]
        g2 = gaze_mask_from_latent(z.astype(jnp.float32), g["beta"], (xx.shape[1], xx.shape[2]))
        g1, g2 = g1[:, None], g2[:, None]  # [B,1,H,W]
        kind = g["prob_dist_type"]
        if kind in ("TV", "JS", "KL"):
            g1 = g1 / jax.lax.stop_gradient(jnp.sum(g1, axis=(1, 2, 3), keepdims=True) + 1e-8)
            g2 = g2 / jax.lax.stop_gradient(jnp.sum(g2, axis=(1, 2, 3), keepdims=True) + 1e-8)
        if kind == "KL":
            return _weighted_mean(_kl(g1, g2), ivg)
        if kind == "TV":
            return _weighted_mean(jnp.sum(jnp.abs(g1 - g2), axis=(1, 2, 3)), ivg)
        if kind == "JS":
            mid = (g1 + g2) / 2
            return 0.5 * (_weighted_mean(_kl(g1, mid), ivg) + _weighted_mean(_kl(g2, mid), ivg))
        if kind == "MSE":
            return _weighted_mean(jnp.mean((g1 - g2) ** 2, axis=(1, 2, 3)), ivg)
        raise ValueError(f"Invalid prob_dist_type: {kind}")

    if method == "Contrastive":
        s = cfg.data["frame_stack"]
        if gg.shape[-1] == 2 * s:
            # dataset-provided packed pos/neg image stacks scaled 0-255
            # (train_bc.py:174-175)
            pos, neg = gg[..., :s] / 255.0, gg[..., s:] / 255.0
        else:
            # analytic fallback: gaze-masked vs inverse-masked observations
            pos, neg = xx * gg, xx * (1.0 - gg)
        z_plus = models.encoder.apply({"params": params["encoder"]}, pos)
        z_minus = models.encoder.apply({"params": params["encoder"]}, neg)
        zf32 = z.astype(jnp.float32)
        t1 = jnp.sum((zf32 - z_plus.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
        t2 = jnp.sum((zf32 - z_minus.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
        margin = jnp.maximum(0.0, t1 - t2 + g["contrastive_threshold"])
        # Samples whose gaze stack carries no mass (tracker-dropout frames
        # blanked to -1 by data/gaze_stats.py:sparsify_gaze_coords) give
        # neg == xx exactly, so t2 == 0 and the hinge t1 + threshold is
        # unsatisfiable — the only descent direction is global encoder
        # collapse (t1 -> 0), which λ=10 then forces on the whole batch
        # (round-5 anchor: seen 13.5 at every seed, loss_reg pinned at
        # ~threshold-8). A no-information pair carries no supervision:
        # gate it out per sample, matching how the Reg/GRIL branches
        # already contribute ~0 on blank frames. The reference never hits
        # this case — its Contrastive branch (train_bc.py:174-179) assumes
        # dataset-packed pos/neg stacks, and with heatmap gg it would index
        # an empty channel slice, i.e. the analytic fallback is ours.
        has_gaze = (jnp.sum(gg, axis=(1, 2, 3)) > 1e-6).astype(jnp.float32)
        return _weighted_mean(margin, ivg * has_gaze)

    if method == "GRIL":
        # Coordinate MSE over VALID points only. The reference feeds -1
        # padding straight into F.mse_loss and clamps the result to [0,100]
        # (train_bc.py:183-192); with multi-point analytic gaze most slots
        # are padding whose on/off pattern flips frame-to-frame, so the
        # unmasked MSE regresses noise and drags the encoder (round-1 GRIL
        # collapse). Masking is the intentional divergence; no clamp needed.
        pred = models.gril_head.apply({"params": params["gril_head"]}, z_flat).astype(jnp.float32)
        target = gc.reshape(b, -1).astype(jnp.float32)
        valid = (target >= 0.0).astype(jnp.float32)
        se = jnp.square(pred - target) * valid
        per = jnp.sum(se, axis=-1) / jnp.maximum(jnp.sum(valid, axis=-1), 1.0)
        return _weighted_mean(per, ivg)

    return jnp.asarray(0.0, jnp.float32)


def bc_loss_fn(params, models: BCModels, cfg, batch, key: jax.Array, train: bool = True):
    """Full BC loss (train_bc.py:203-299).

    batch: obs_seq [B,L,H,W,C] uint8, gaze_seq [B,L,P*2] f32,
           actions [B,A] or [B,L,A] f32.
    """
    g, d = cfg.gaze, cfg.dropout
    k_ivg_unused, k_gmd, k_igmd, k_oreo = jax.random.split(key, 4)

    xx, gg, center = models.heatmapper.prepare_for_bc(
        batch["obs_seq"],
        batch["gaze_seq"],
        frame_stack=cfg.data["frame_stack"],
        grayscale=cfg.model["grayscale"],
        aggregate_stack=bool(g.get("temporal_flag", True)),
    )
    actions = batch["actions"]
    if actions.ndim == 3:
        actions = actions[:, min(center, actions.shape[1] - 1)]
    actions = actions.astype(jnp.float32)
    bsz = xx.shape[0]
    gc = batch["gaze_seq"][:, center]

    # partial-gaze selection: content-hash pseudo-random per sample
    # (train_bc.py:229-240)
    ratio = float(g.get("ratio", 1.0))
    if ratio >= 1.0:
        ivg = jnp.ones((bsz,), jnp.float32)
    elif ratio <= 0.0:
        ivg = jnp.zeros((bsz,), jnp.float32)
    else:
        # integer content hash (Knuth multiplicative on the bit pattern of
        # the frame sum). NOT float `(key * 123456.789) % 1.0`: per_key is
        # ~3e4, the product's f32 ULP is ~512, and the fractional part
        # rounds to 0 for every sample — every ratio > 0 silently behaved
        # as ratio 1.0.
        per_key = jnp.sum(xx.astype(jnp.float32), axis=(1, 2, 3))
        kbits = jax.lax.bitcast_convert_type(per_key, jnp.int32)
        h = kbits * jnp.int32(-1640531527)  # 2654435761 mod 2^32, wraps
        r = (h & jnp.int32(32767)).astype(jnp.float32) / 32768.0
        ivg = (r < ratio).astype(jnp.float32)

    ivg_e = ivg[:, None, None, None]
    gg_mul = ivg_e * gg + (1.0 - ivg_e)  # unused-gaze -> identity mask
    gg_cat = ivg_e * gg  # unused-gaze -> zero mask
    igmd_mask = gg_cat if d["method"] == "IGMD" else None

    method = g["method"]
    if method == "Mask":
        enc_in = xx * gg_mul
    elif method == "ViSaRL":
        enc_in = jnp.concatenate([xx, gg_cat], axis=-1)
    else:
        enc_in = xx

    enc_kwargs = {}
    if igmd_mask is not None:
        enc_kwargs = dict(dropout_mask=igmd_mask, deterministic=not train)
    rngs = {"dropout": k_igmd} if (igmd_mask is not None and train) else None
    enc_apply = models.encoder.apply
    if cfg.get_path("training.remat", False):
        # rematerialize encoder activations on backward: trades ~30% FLOPs
        # for the dominant activation memory at large batch
        enc_apply = jax.checkpoint(enc_apply, static_argnums=())
    z = enc_apply({"params": params["encoder"]}, enc_in, rngs=rngs, **enc_kwargs)

    if method == "AGIL" and models.encoder_agil is not None:
        z_agil = models.encoder_agil.apply({"params": params["encoder_agil"]}, xx * gg_mul)
        z = jnp.where(ivg_e > 0, 0.5 * (z + z_agil), z)

    if d["method"] == "GMD":
        z = gmd_dropout(z, gg_cat, key=k_gmd, test_mode=not train)
    elif d["method"] == "Oreo" and models.quantizer is not None:
        m_rep, prob = d["oreo_num_mask"], d["oreo_prob"]
        vq = models.quantizer.apply({"params": jax.lax.stop_gradient(params["quantizer"])}, z)
        idx = jax.lax.stop_gradient(vq.encoding_indices)  # [B, h*w]
        code_mask = jax.random.bernoulli(
            k_oreo, 1.0 - prob, (m_rep * bsz, d["num_embeddings"])
        ).astype(jnp.float32)
        idx_rep = jnp.tile(idx, (m_rep, 1))  # m-major, matching repeat('b ... -> (m b) ...')
        mask = jnp.take_along_axis(code_mask, idx_rep, axis=1)  # [m*B, h*w]
        zh, zw = z.shape[1], z.shape[2]
        mask = mask.reshape(m_rep * bsz, zh, zw, 1)
        z = jnp.tile(z, (m_rep, 1, 1, 1)) * mask / (1.0 - prob)
        actions = jnp.tile(actions, (m_rep, 1))

    z_flat = models.pre_actor.apply({"params": params["pre_actor"]}, z)
    logits = models.actor.apply({"params": params["actor"]}, z_flat).astype(jnp.float32)
    actor_loss = jnp.mean((logits - actions) ** 2)

    reg_z = z_flat if method == "GRIL" else z
    reg_loss = _reg_loss(models, cfg, params, reg_z, z_flat, gg, gc, xx, ivg, key)

    total = g["lambda_weight"] * reg_loss + actor_loss
    metrics = {"loss": total, "loss_actor": actor_loss, "loss_reg": reg_loss}
    return total, metrics


def make_bc_train_step(models: BCModels, cfg, donate: bool = True, jit: bool = True,
                       axis_name: str | None = None):
    """(state, batch, rng) -> (state, metrics). Grads psum over 'data'
    happen implicitly via jit + sharded batch inputs. ``jit=False`` returns
    the raw step for embedding in a larger jitted graph (whole-epoch scan).
    ``axis_name`` inserts an explicit grad/metric pmean for use inside
    shard_map, where reductions are shard-local (the DDP allreduce analogue,
    reference train/common/distributed.py:30-32)."""

    def step(state: TrainState, batch, rng: jax.Array):
        def loss_fn(p):
            return bc_loss_fn(p, models, cfg, batch, rng, train=True)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        new_state = state.apply_gradients(grads=grads)
        return new_state, metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_bc_policy_fn(models: BCModels, cfg):
    """Eval-time policy: (params, obs [B,H,W,S*C'], heat [B,H,W,S]|None) -> [B,A].

    Mirrors BCAgent._predict_control's method-specific input assembly and
    GMD/IGMD test-mode paths (eval/my_agents/bc_agent.py:271-305).
    """
    g, d = cfg.gaze, cfg.dropout
    method = g["method"]

    def policy(params, obs, heat=None):
        if heat is None:
            heat = jnp.zeros(obs.shape[:3] + (cfg.data["frame_stack"],), jnp.float32)
        if method == "Mask":
            enc_in = obs * heat
        elif method == "ViSaRL":
            enc_in = jnp.concatenate([obs, heat], axis=-1)
        else:
            enc_in = obs
        kwargs = {}
        if d["method"] == "IGMD":
            kwargs = dict(dropout_mask=heat, deterministic=True)
        z = models.encoder.apply({"params": params["encoder"]}, enc_in, **kwargs)
        if method == "AGIL" and models.encoder_agil is not None:
            z_agil = models.encoder_agil.apply({"params": params["encoder_agil"]}, obs * heat)
            z = 0.5 * (z + z_agil)
        if d["method"] == "GMD":
            z = gmd_dropout(z, heat, test_mode=True)
        z_flat = models.pre_actor.apply({"params": params["pre_actor"]}, z)
        return models.actor.apply({"params": params["actor"]}, z_flat).astype(jnp.float32)

    return policy
