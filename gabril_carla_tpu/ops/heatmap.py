"""Gaze-heatmap generation, TPU-first.

The reference builds heatmaps by scatter-adding delta maps and running a
separable Gaussian blur (vlm_gaze/data_utils/data_loader_robomimic.py:85-139).
Scatter + wide conv are a poor fit for the TPU; since blur is linear, the
blurred delta map equals a sum of rank-1 outer products of banded-Gaussian
matrix columns gathered at the gaze pixels:

    heat[b,t] = sum_p valid_p * outer(Gh[:, y_p], Gw[:, x_p])

which is a tiny batched matmul (MXU) plus per-map min-max normalization —
bit-equivalent to scatter+blur with zero padding, with no scatter and no conv.

Temporal aggregation contracts (data_loader_robomimic.py:204-278):
  * alpha_decay: per-step normalized heatmaps combined causally with weights
    alpha^(s-j), then re-normalized per step.
  * multiscale: per-step sigma/coeff Gaussian splats of the raw deltas,
    causal cumulative sum, then a single normalization per step.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from .image import format_obs_stack, stack_window_indices


@functools.lru_cache(maxsize=None)
def gaussian_splat_matrix(size: int, sigma: float) -> np.ndarray:
    """[size, size] banded matrix equal to zero-padded separable Gaussian blur.

    Kernel length is int(4*sigma+1) rounded up to odd, normalized to sum 1,
    matching the reference kernel construction (data_loader_robomimic.py:71-79).
    """
    ksize = int(4 * sigma + 1)
    if ksize % 2 == 0:
        ksize += 1
    half = ksize // 2
    x = np.arange(ksize, dtype=np.float64) - half
    k1d = np.exp(-(x**2) / (2.0 * sigma**2))
    k1d = k1d / k1d.sum()
    i = np.arange(size)[:, None]
    j = np.arange(size)[None, :]
    d = i - j
    mat = np.where(np.abs(d) <= half, k1d[np.clip(d + half, 0, ksize - 1)], 0.0)
    return mat.astype(np.float32)


def _normalize_minmax(h: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize over the last two (spatial) axes."""
    mn = jnp.min(h, axis=(-2, -1), keepdims=True)
    mx = jnp.max(h, axis=(-2, -1), keepdims=True)
    return (h - mn) / (mx - mn + 1e-8)


class GazeHeatmapper:
    """Pure-function gaze preprocessor (GazePreprocessor parity, jnp).

    All methods are jit/vmap-safe: shapes are static, parameters are baked
    constants. Heatmap channel layout is NHWC-style: stacks go channel-last.
    """

    def __init__(
        self,
        img_height: int = 180,
        img_width: int = 320,
        gaze_sigma: float = 30.0,
        gaze_coeff: float = 0.8,
        maxpoints: int = 5,
        temporal_alpha: float = 0.7,
        temporal_mode: str = "alpha_decay",
        temporal_sigmas: tuple[float, ...] | None = None,
        temporal_coeffs: tuple[float, ...] | None = None,
        temporal_offset_start: int = 0,
    ):
        self.img_height = img_height
        self.img_width = img_width
        self.gaze_sigma = float(gaze_sigma)
        self.gaze_coeff = float(gaze_coeff)
        self.maxpoints = int(maxpoints)
        self.temporal_alpha = float(temporal_alpha)
        self.temporal_mode = str(temporal_mode)
        self.temporal_sigmas = tuple(float(s) for s in temporal_sigmas) if temporal_sigmas else None
        self.temporal_coeffs = tuple(float(c) for c in temporal_coeffs) if temporal_coeffs else None
        self.temporal_offset_start = int(max(0, temporal_offset_start))

    # ------------------------------------------------------------------ utils
    def _coords(self, gaze: jnp.ndarray):
        """[.., P*2] or [.., P, 2] -> (xi, yi, valid) integer pixel indices."""
        if gaze.shape[-1] == self.maxpoints * 2:
            gaze = gaze.reshape(*gaze.shape[:-1], self.maxpoints, 2)
        gx, gy = gaze[..., 0], gaze[..., 1]
        valid = (gx >= 0) & (gy >= 0)
        xi = jnp.clip(
            (jnp.clip(gx, 0.0, 1.0) * (self.img_width - 1)).astype(jnp.int32), 0, self.img_width - 1
        )
        yi = jnp.clip(
            (jnp.clip(gy, 0.0, 1.0) * (self.img_height - 1)).astype(jnp.int32), 0, self.img_height - 1
        )
        return xi, yi, valid.astype(jnp.float32)

    def _splat(self, gaze: jnp.ndarray, sigma: float) -> jnp.ndarray:
        """Blurred delta maps for [..., P(, 2)] coords -> [..., H, W]."""
        xi, yi, valid = self._coords(gaze)
        gh = jnp.asarray(gaussian_splat_matrix(self.img_height, sigma))
        gw = jnp.asarray(gaussian_splat_matrix(self.img_width, sigma))
        rows = gh[yi] * valid[..., None]  # [..., P, H]
        cols = gw[xi]  # [..., P, W]
        return jnp.einsum("...ph,...pw->...hw", rows, cols, precision="highest")

    # ------------------------------------------------------------- public API
    def heatmaps(self, gaze: jnp.ndarray) -> jnp.ndarray:
        """Per-step normalized heatmaps: [..., P*2] -> [..., H, W] in [0,1].

        Parity with GazePreprocessor.forward (data_loader_robomimic.py:85-139).
        """
        return _normalize_minmax(self._splat(gaze, self.gaze_sigma))

    def build_stack_heatmaps(self, gaze_seq: jnp.ndarray, frame_stack: int, center_idx: int) -> jnp.ndarray:
        """Causally aggregated per-stack heatmaps: [B, L, ...] -> [B, S, H, W].

        Parity with build_stack_heatmaps (data_loader_robomimic.py:204-278).
        """
        idxs = jnp.asarray(stack_window_indices(center_idx, frame_stack, gaze_seq.shape[1]))
        gaze_stack = gaze_seq[:, idxs]  # [B, S, ...]
        s = frame_stack

        if self.temporal_mode == "multiscale" and self.temporal_sigmas:
            steps = []
            for j in range(s):
                sig = self.temporal_sigmas[min(self.temporal_offset_start + j, len(self.temporal_sigmas) - 1)]
                coeff = 1.0
                if self.temporal_coeffs:
                    coeff = self.temporal_coeffs[min(self.temporal_offset_start + j, len(self.temporal_coeffs) - 1)]
                steps.append(coeff * self._splat(gaze_stack[:, j], sig))
            blurred = jnp.stack(steps, axis=1)  # [B, S, H, W]
            agg = jnp.cumsum(blurred, axis=1)
            return _normalize_minmax(agg)

        base = self.heatmaps(gaze_stack)  # [B, S, H, W]
        # Causal alpha-decay mix: agg[s] = sum_{j<=s} alpha^(s-j) base[j]
        sj = np.arange(s)[:, None] - np.arange(s)[None, :]
        mix = np.where(sj >= 0, self.temporal_alpha**np.maximum(sj, 0), 0.0).astype(np.float32)
        agg = jnp.einsum("sj,bjhw->bshw", jnp.asarray(mix), base)
        return _normalize_minmax(agg)

    def prepare_for_bc(
        self,
        obs_image_seq: jnp.ndarray,
        gaze_seq: jnp.ndarray,
        frame_stack: int,
        grayscale: bool = False,
        aggregate_stack: bool = True,
    ):
        """One-call API for BC training (data_loader_robomimic.py:318-360).

        Args:
            obs_image_seq: [B, L, H, W, C] uint8 or float.
            gaze_seq: [B, L, P*2] or [B, L, P, 2].

        Returns:
            obs: [B, H, W, S*C'] float in [0,1] (NHWC, frame-major channels)
            heat: [B, H, W, S] gaze heatmaps, stack channel-last
            center_idx: int
        """
        center_idx = obs_image_seq.shape[1] - 1
        idxs = jnp.asarray(stack_window_indices(center_idx, frame_stack, obs_image_seq.shape[1]))
        obs = format_obs_stack(obs_image_seq[:, idxs], grayscale=grayscale)
        if aggregate_stack:
            heat = self.build_stack_heatmaps(gaze_seq, frame_stack, center_idx)
        else:
            heat = self.heatmaps(gaze_seq[:, idxs])
        return obs, jnp.transpose(heat, (0, 2, 3, 1)), center_idx

    def prepare_for_gaze_predictor(
        self,
        obs_image_seq: jnp.ndarray,
        gaze_seq: jnp.ndarray,
        frame_stack: int,
        grayscale: bool = False,
    ):
        """One-call API for gaze-predictor training (data_loader_robomimic.py:362-379).

        Returns (obs [B,H,W,S*C'], target heatmap [B,H,W,1], center_idx).
        """
        center_idx = obs_image_seq.shape[1] - 1
        idxs = jnp.asarray(stack_window_indices(center_idx, frame_stack, obs_image_seq.shape[1]))
        obs = format_obs_stack(obs_image_seq[:, idxs], grayscale=grayscale)
        agg = self.build_stack_heatmaps(gaze_seq, frame_stack, center_idx)  # [B,S,H,W]
        return obs, jnp.transpose(agg[:, -1:], (0, 2, 3, 1)), center_idx
