"""VQ-VAE pretraining: encoder + straight-through quantizer + decoder.

The reference's Oreo dropout needs a frozen pretrained quantizer
(train/train_bc.py:87-99 loads `_encoder`/`_quantizer` weights from a VQ-VAE
checkpoint; model at models/linear_models.py:285-299). This trainer produces
that checkpoint: recon MSE + per-sample VQ loss, same Trainer loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.training.train_state import TrainState

from ..models import Decoder, Encoder, VectorQuantizer
from ..ops.heatmap import GazeHeatmapper


def build_vqvae_models(cfg):
    m = cfg.model
    dt = jnp.bfloat16 if cfg.get_path("training.compute_dtype", "float32") == "bfloat16" else jnp.float32
    per = 1 if m["grayscale"] else 3
    cin = cfg.data["frame_stack"] * per
    enc = Encoder(m["embedding_dim"], m["num_hiddens"], m["num_residual_layers"],
                  m["num_residual_hiddens"], dt)
    dec = Decoder(cin, m["num_hiddens"], m["num_residual_layers"], m["num_residual_hiddens"], dt)
    vq = VectorQuantizer(m["embedding_dim"], cfg.get_path("dropout.num_embeddings", 512), 0.25)
    heatmapper = GazeHeatmapper(
        img_height=cfg.data["img_height"], img_width=cfg.data["img_width"],
        maxpoints=cfg.get_path("gaze.max_points", 5),
    )
    return (enc, dec, vq), heatmapper


def init_vqvae_state(cfg, rng: jax.Array, tx):
    (enc, dec, vq), heatmapper = build_vqvae_models(cfg)
    h, w = cfg.data["img_height"], cfg.data["img_width"]
    per = 1 if cfg.model["grayscale"] else 3
    x = jnp.zeros((1, h, w, cfg.data["frame_stack"] * per), jnp.float32)
    k = jax.random.split(rng, 3)
    params = {"encoder": enc.init(k[0], x)["params"]}
    z = enc.apply({"params": params["encoder"]}, x)
    params["quantizer"] = vq.init(k[1], z)["params"]
    params["decoder"] = dec.init(k[2], z)["params"]
    return ((enc, dec, vq), heatmapper), TrainState.create(apply_fn=None, params=params, tx=tx)


def make_vqvae_train_step(models, heatmapper, cfg, donate: bool = True, jit: bool = True,
                          axis_name: str | None = None):
    enc, dec, vq = models

    def loss_fn(params, batch):
        from ..ops.image import format_obs_stack, stack_window_indices

        seq = batch["obs_seq"]
        idxs = jnp.asarray(stack_window_indices(seq.shape[1] - 1, cfg.data["frame_stack"], seq.shape[1]))
        x = format_obs_stack(seq[:, idxs], grayscale=cfg.model["grayscale"])
        z = enc.apply({"params": params["encoder"]}, x)
        out = vq.apply({"params": params["quantizer"]}, z)
        recon = dec.apply({"params": params["decoder"]}, out.quantized).astype(jnp.float32)
        recon_loss = jnp.mean((recon - x) ** 2)
        vq_loss = jnp.mean(out.loss)
        total = recon_loss + vq_loss
        return total, {"loss": total, "loss_recon": recon_loss, "loss_vq": vq_loss,
                       "perplexity": out.perplexity}

    def step(state: TrainState, batch, rng):
        del rng
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        return state.apply_gradients(grads=grads), metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_revive_dead_codes(models, cfg):
    """Dead-codebook revival (run between epochs by the Trainer).

    Straight-through VQ training can collapse — every latent maps to one
    code, the rest of the codebook receives no gradient and drifts away
    (observed: perplexity 200 -> 1 over 20 epochs). The standard remedy is to
    re-seed unused entries with encoder outputs from the current data
    (van den Oord et al.'s EMA variant does this implicitly; explicit
    restarts are the stateless form). Returns params with dead codebook rows
    replaced by randomly-chosen batch latents (plus the recentering offset
    the quantizer subtracts at apply time).
    """
    enc, dec, vq = models

    @jax.jit
    def revive(params, batch, rng):
        from ..ops.image import format_obs_stack, stack_window_indices

        seq = batch["obs_seq"]
        idxs = jnp.asarray(stack_window_indices(seq.shape[1] - 1, cfg.data["frame_stack"], seq.shape[1]))
        x = format_obs_stack(seq[:, idxs], grayscale=cfg.model["grayscale"])
        z = enc.apply({"params": params["encoder"]}, x).astype(jnp.float32)
        flat = z.reshape(-1, z.shape[-1])
        k = vq.num_embeddings
        raw = params["quantizer"]["codebook"]
        codebook = raw - 1.0 / k  # quantizer recenters at apply time
        dist = (jnp.sum(flat**2, 1, keepdims=True) + jnp.sum(codebook**2, 1)[None]
                - 2.0 * flat @ codebook.T)
        used = jnp.zeros(k, bool).at[jnp.argmin(dist, axis=1)].set(True)
        pick = jax.random.randint(rng, (k,), 0, flat.shape[0])
        jitter = 0.01 * jax.random.normal(jax.random.fold_in(rng, 1), (k, flat.shape[-1]))
        fresh = flat[pick] + jitter + 1.0 / k
        new_raw = jnp.where(used[:, None], raw, fresh)
        q = dict(params["quantizer"])
        q["codebook"] = new_raw.astype(raw.dtype)
        out = dict(params)
        out["quantizer"] = q
        return out, jnp.sum(~used)

    return revive
