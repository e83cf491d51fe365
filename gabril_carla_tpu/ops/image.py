"""Image primitives, TPU-first.

Resizes are expressed as dense interpolation-weight matrices applied with two
matmuls (``out = Wh @ img @ Ww^T``) so they run on the MXU and fuse under XLA,
instead of the gather-heavy form a direct port of
``torch.nn.functional.interpolate`` would produce.

Numeric contract: matches torch ``interpolate(mode='bicubic',
align_corners=False)`` (cubic convolution a=-0.75, half-pixel centers, clamped
borders), which the reference uses for gaze-mask upsampling
(vlm_gaze/data_utils/gaze_utils.py:19,39) and observation resizing
(vlm_gaze/eval/my_agents/bc_agent.py:232-236).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

# Luma coefficients used throughout the reference
# (vlm_gaze/data_utils/data_loader_robomimic.py:193).
_LUMA = (0.299, 0.587, 0.114)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), a=-0.75 as in torch bicubic."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def bicubic_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] bicubic interpolation matrix.

    Half-pixel coordinate mapping with border clamping; row sums are 1.
    Computed once per (in, out) pair at trace time (static shapes).
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    i = np.arange(out_size, dtype=np.float64)
    center = (i + 0.5) * scale - 0.5
    i0 = np.floor(center).astype(np.int64)
    t = center - i0  # in [0, 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(i0 + tap, 0, in_size - 1)
        w = _cubic_kernel(t - tap)
        np.add.at(mat, (np.arange(out_size), idx), w)
    return mat.astype(np.float32)


def resize_bicubic(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bicubic resize of [..., H, W] via two MXU matmuls."""
    h, w = img.shape[-2], img.shape[-1]
    if h == out_h and w == out_w:
        return img
    wh = jnp.asarray(bicubic_resize_matrix(h, out_h))
    ww = jnp.asarray(bicubic_resize_matrix(w, out_w))
    # HIGHEST matmul precision: resize weights are a numeric contract shared
    # with the reference (bf16 MXU passes would drift the gaze masks).
    out = jnp.einsum("oh,...hw->...ow", wh, img.astype(jnp.float32), precision="highest")
    out = jnp.einsum("pw,...ow->...op", ww, out, precision="highest")
    return out


def rgb_to_grayscale(img: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """Luma grayscale with the reference's 0.299/0.587/0.114 coefficients.

    Keeps a singleton channel at ``channel_axis``.
    """
    r, g, b = jnp.split(img, 3, axis=channel_axis)
    return _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b


def stack_window_indices(center_idx: int, stack_len: int, seq_len: int) -> np.ndarray:
    """Frame-stack gather indices ending at ``center_idx``, edge-clamped.

    Mirrors the reference's window gather
    (vlm_gaze/data_utils/data_loader_robomimic.py:144-157): indices
    [center-S+1, ..., center] clamped into [0, L-1].
    """
    start = center_idx - (stack_len - 1)
    idxs = np.clip(np.arange(start, center_idx + 1), 0, seq_len - 1)
    return idxs.astype(np.int32)


def format_obs_stack(images: jnp.ndarray, grayscale: bool) -> jnp.ndarray:
    """[B, S, H, W, C] uint8/float -> encoder-ready NHWC [B, H, W, S*C'].

    Scales uint8 to [0,1]; optional luma conversion (C'=1). Channel order is
    (s, c) flattened — frame-major, matching the reference's
    'b s c h w -> b (s c) h w' (data_loader_robomimic.py:194).
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    b, s, h, w, c = images.shape
    if grayscale and c == 3:
        images = rgb_to_grayscale(images, channel_axis=-1)
        c = 1
    # [B, S, H, W, C] -> [B, H, W, S, C] -> [B, H, W, S*C]
    x = jnp.transpose(images, (0, 2, 3, 1, 4))
    return x.reshape(b, h, w, s * c)
