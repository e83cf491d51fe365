"""Heatmap generation parity vs an independent torch scatter+blur oracle.

The oracle implements the documented reference math
(data_loader_robomimic.py:85-139,204-278): scatter-add valid gaze points into
delta maps, separable Gaussian blur (kernel 4*sigma+1, odd), min-max
normalization, and the two causal temporal-aggregation modes.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from gabril_carla_tpu.ops import GazeHeatmapper

H, W, P = 36, 64, 5


def torch_kernel1d(sigma):
    k = int(4 * sigma + 1)
    if k % 2 == 0:
        k += 1
    x = torch.arange(k).float() - k // 2
    g = torch.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def torch_splat(coords, sigma):
    """coords [N, P, 2] in [0,1] with -1 invalid -> [N, H, W] blurred deltas."""
    n = coords.shape[0]
    valid = (coords[..., 0] >= 0) & (coords[..., 1] >= 0)
    x = (coords[..., 0].clamp(0, 1) * (W - 1)).long().clamp(0, W - 1)
    y = (coords[..., 1].clamp(0, 1) * (H - 1)).long().clamp(0, H - 1)
    delta = torch.zeros(n, H * W)
    delta.scatter_add_(1, y * W + x, valid.float())
    delta = delta.view(n, 1, H, W)
    k1 = torch_kernel1d(sigma)
    pad = len(k1) // 2
    out = F.conv2d(delta, k1.view(1, 1, 1, -1), padding=(0, pad))
    out = F.conv2d(out, k1.view(1, 1, -1, 1), padding=(pad, 0))
    return out.squeeze(1)


def torch_norm(h):
    mn = h.amin(dim=(-2, -1), keepdim=True)
    mx = h.amax(dim=(-2, -1), keepdim=True)
    return (h - mn) / (mx - mn + 1e-8)


def rand_coords(rng, shape):
    c = rng.random((*shape, 2)).astype(np.float32)
    invalid = rng.random(shape) < 0.3
    c[invalid] = -1.0
    return c


def test_heatmaps_match_scatter_blur():
    rng = np.random.default_rng(2)
    coords = rand_coords(rng, (4, 3, P))  # [B, T, P]
    hm = GazeHeatmapper(img_height=H, img_width=W, gaze_sigma=5.0, maxpoints=P)
    ours = np.asarray(hm.heatmaps(jnp.asarray(coords.reshape(4, 3, P * 2))))
    oracle = torch_norm(torch_splat(torch.from_numpy(coords).view(-1, P, 2), 5.0).view(4, 3, H, W)).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_all_invalid_points_give_zero_map():
    coords = -np.ones((1, 1, P * 2), dtype=np.float32)
    hm = GazeHeatmapper(img_height=H, img_width=W, gaze_sigma=5.0, maxpoints=P)
    out = np.asarray(hm.heatmaps(jnp.asarray(coords)))
    assert np.allclose(out, 0.0)


def test_alpha_decay_aggregation():
    rng = np.random.default_rng(3)
    S, L, alpha = 3, 4, 0.7
    coords = rand_coords(rng, (2, L, P))
    hm = GazeHeatmapper(img_height=H, img_width=W, gaze_sigma=5.0, maxpoints=P, temporal_alpha=alpha)
    ours = np.asarray(hm.build_stack_heatmaps(jnp.asarray(coords.reshape(2, L, P * 2)), S, L - 1))

    # oracle: window [L-S, L-1], per-step normalized base, causal alpha mix, renorm
    win = torch.from_numpy(coords[:, L - S :])
    base = torch_norm(torch_splat(win.reshape(-1, P, 2), 5.0).view(2, S, H, W))
    agg = torch.zeros_like(base)
    for s in range(S):
        for j in range(s + 1):
            agg[:, s] += alpha ** (s - j) * base[:, j]
    oracle = torch_norm(agg).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_multiscale_aggregation():
    rng = np.random.default_rng(4)
    S, L = 2, 2
    sigmas, coeffs = (6.0, 3.0), (1.0, 0.5)
    coords = rand_coords(rng, (2, L, P))
    hm = GazeHeatmapper(
        img_height=H, img_width=W, gaze_sigma=5.0, maxpoints=P,
        temporal_mode="multiscale", temporal_sigmas=sigmas, temporal_coeffs=coeffs,
    )
    ours = np.asarray(hm.build_stack_heatmaps(jnp.asarray(coords.reshape(2, L, P * 2)), S, L - 1))

    win = torch.from_numpy(coords)
    steps = [coeffs[s] * torch_splat(win[:, s], sigmas[s]) for s in range(S)]
    agg = torch.cumsum(torch.stack(steps, dim=1), dim=1)
    oracle = torch_norm(agg).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)
