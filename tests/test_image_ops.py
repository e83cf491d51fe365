"""Cross-check image primitives against torch's reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from gabril_carla_tpu.ops import resize_bicubic, rgb_to_grayscale, stack_window_indices


@pytest.mark.parametrize("in_hw,out_hw", [((20, 38), (180, 320)), ((45, 80), (20, 38)), ((180, 320), (180, 320))])
def test_resize_bicubic_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, *in_hw)).astype(np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(x), *out_hw))
    theirs = (
        F.interpolate(torch.from_numpy(x)[:, None], size=out_hw, mode="bicubic", align_corners=False)
        .squeeze(1)
        .numpy()
    )
    # separable application order differs from torch's internal order -> tiny
    # float drift on downsamples
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_grayscale_luma():
    rng = np.random.default_rng(1)
    x = rng.random((2, 4, 5, 3)).astype(np.float32)
    g = np.asarray(rgb_to_grayscale(jnp.asarray(x)))
    ref = 0.299 * x[..., :1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
    np.testing.assert_allclose(g, ref, rtol=1e-6)


def test_stack_window_clamps_front():
    # center 0 with stack 3 in a length-5 sequence -> [0, 0, 0]
    np.testing.assert_array_equal(stack_window_indices(0, 3, 5), [0, 0, 0])
    np.testing.assert_array_equal(stack_window_indices(4, 3, 5), [2, 3, 4])
    np.testing.assert_array_equal(stack_window_indices(1, 4, 5), [0, 0, 0, 1])
