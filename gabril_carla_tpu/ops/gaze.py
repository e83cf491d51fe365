"""GABRIL gaze math: saliency-from-latent masks and gaze-modulated dropout.

Numeric contracts reproduced from the reference
(vlm_gaze/data_utils/gaze_utils.py:7-52); layouts are NHWC (TPU-native)
instead of torch NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .image import resize_bicubic


def gaze_mask_from_latent(z: jnp.ndarray, beta: float, target_hw: tuple[int, int]) -> jnp.ndarray:
    """Saliency mask from an encoder latent.

    channel-abs-sum -> softmax over spatial locations with temperature ``beta``
    -> bicubic upsample to ``target_hw`` -> per-sample min-max normalization.
    Matches gaze_utils.get_gaze_mask (gaze_utils.py:7-30).

    Args:
        z: latent [B, h, w, C] (NHWC).
        beta: softmax temperature (reference default 50).
        target_hw: output (H, W).

    Returns:
        [B, H, W] mask in [0, 1].
    """
    b, h, w, _ = z.shape
    sal = jnp.sum(jnp.abs(z), axis=-1)  # [B, h, w]
    flat = sal.reshape(b, h * w).astype(jnp.float32)
    p = jax.nn.softmax(flat / beta, axis=-1).reshape(b, h, w)
    up = resize_bicubic(p, target_hw[0], target_hw[1])  # [B, H, W]
    mx = jnp.max(up.reshape(b, -1), axis=-1)[:, None, None]
    mn = jnp.min(up.reshape(b, -1), axis=-1)[:, None, None]
    return (up - mn) / (mx - mn)


def gmd_dropout(
    z: jnp.ndarray,
    g: jnp.ndarray,
    key: jax.Array | None = None,
    test_mode: bool = False,
    dropout_prob: float = 0.7,
) -> jnp.ndarray:
    """Gaze-modulated dropout (gaze_utils.apply_gmd_dropout, gaze_utils.py:33-52).

    Keep-probability map K = p * minmax(resize(mean_s(g))) + (1 - p). At train
    time multiplies by a Bernoulli(A < K) mask; at test time by K itself.
    The min-max normalization is over the *whole batch tensor* (global max/min),
    matching the reference's ``K.max() - K.min()``.

    Args:
        z: latent [B, h, w, C] (NHWC).
        g: gaze heatmaps [B, H, W] or [B, H, W, S] (stack channel-last).
        key: PRNG key, required when ``test_mode`` is False.
        test_mode: multiply by K instead of sampling.

    Returns:
        z with dropout applied, same shape.
    """
    b, h, w, _ = z.shape
    if g.ndim == 3:
        g = g[..., None]
    # mean over the stack channel, then resize to the latent grid
    gm = jnp.mean(g.astype(jnp.float32), axis=-1)  # [B, H, W]
    k = resize_bicubic(gm, h, w)  # [B, h, w]
    denom = jnp.max(k) - jnp.min(k)
    k = (k - jnp.min(k)) / (denom + 1e-8)
    k = dropout_prob * k + (1.0 - dropout_prob)
    k = k[..., None]  # [B, h, w, 1]
    if test_mode:
        return z * k
    a = jax.random.uniform(key, (b, h, w, 1), dtype=jnp.float32)
    m = (a < k).astype(z.dtype)
    return z * m
