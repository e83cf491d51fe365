"""GABRIL gaze-mask and GMD dropout parity vs torch oracles."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gabril_carla_tpu.ops import gaze_mask_from_latent, gmd_dropout


def test_gaze_mask_matches_torch():
    rng = np.random.default_rng(5)
    z = rng.standard_normal((2, 20, 38, 16)).astype(np.float32)
    beta, hw = 50.0, (180, 320)
    ours = np.asarray(gaze_mask_from_latent(jnp.asarray(z), beta, hw))

    # oracle: abs-sum over channels, softmax(flat/beta), bicubic up, minmax
    zt = torch.from_numpy(z).permute(0, 3, 1, 2)
    sal = zt.abs().sum(dim=1)
    p = torch.softmax(sal.view(2, -1) / beta, dim=-1).view(2, 1, 20, 38)
    up = F.interpolate(p, size=hw, mode="bicubic", align_corners=False)
    flat = up.view(2, -1)
    mx = flat.max(-1).values.view(2, 1, 1, 1)
    mn = flat.min(-1).values.view(2, 1, 1, 1)
    oracle = ((up - mn) / (mx - mn)).squeeze(1).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=1e-5)


def test_gmd_test_mode_matches_torch():
    rng = np.random.default_rng(6)
    z = rng.standard_normal((2, 20, 38, 8)).astype(np.float32)
    g = rng.random((2, 36, 64, 2)).astype(np.float32)  # stacked heatmaps, channel-last
    ours = np.asarray(gmd_dropout(jnp.asarray(z), jnp.asarray(g), test_mode=True))

    zt = torch.from_numpy(z).permute(0, 3, 1, 2)
    gt = torch.from_numpy(g).permute(0, 3, 1, 2)
    k = F.interpolate(gt, size=(20, 38), mode="bicubic", align_corners=False).mean(dim=1, keepdim=True)
    k = (k - k.min()) / (k.max() - k.min() + 1e-8)
    k = 0.7 * k + 0.3
    oracle = (zt * k).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_gmd_train_mode_is_bernoulli_mask():
    rng = np.random.default_rng(7)
    z = np.abs(rng.standard_normal((4, 10, 12, 3)).astype(np.float32)) + 0.1
    g = rng.random((4, 36, 64)).astype(np.float32)
    out = np.asarray(gmd_dropout(jnp.asarray(z), jnp.asarray(g), key=jax.random.PRNGKey(0)))
    ratio = out / z
    # every element either kept (ratio 1) or dropped (ratio 0)
    assert np.all((np.abs(ratio) < 1e-6) | (np.abs(ratio - 1) < 1e-6))
    keep_frac = (ratio > 0.5).mean()
    assert 0.2 < keep_frac < 1.0
