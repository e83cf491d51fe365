"""4-level UNet gaze model (models/gaze_predictor.py:6-78 parity, NHWC).

Skip-connected encoder/decoder over 180x320; BatchNorm -> GroupNorm here
(stateless, jit/vmap-friendly — running stats would thread mutable state
through pjit for no accuracy benefit at these widths).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

P1 = ((1, 1), (1, 1))


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding=P1, dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=min(8, self.features))(x)
            x = nn.relu(x)
        return x


def _pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class UNet(nn.Module):
    output_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        e1 = ConvBlock(8, self.dtype)(x)  # 180x320
        e2 = ConvBlock(16, self.dtype)(_pool(e1))  # 90x160
        e3 = ConvBlock(16, self.dtype)(_pool(e2))  # 45x80
        e4 = ConvBlock(32, self.dtype)(_pool(e3))  # 22x40 (floor)

        bott = ConvBlock(32, self.dtype)(_pool(e4))  # 11x20

        d4 = nn.ConvTranspose(32, (2, 2), strides=(2, 2), dtype=self.dtype)(bott)  # 22x40
        d4 = ConvBlock(32, self.dtype)(jnp.concatenate([d4, e4], axis=-1))
        # 22 -> 45 needs output padding on H (reference output_padding=(1,0));
        # flax explicit pads: out = (in-1)*s + 2 - k + pl + ph, so H=(1,2), W=(1,1)
        d3 = nn.ConvTranspose(16, (2, 2), strides=(2, 2), padding=((1, 2), (1, 1)), dtype=self.dtype)(d4)
        d3 = ConvBlock(16, self.dtype)(jnp.concatenate([d3, e3], axis=-1))
        d2 = nn.ConvTranspose(16, (2, 2), strides=(2, 2), dtype=self.dtype)(d3)  # 90x160
        d2 = ConvBlock(16, self.dtype)(jnp.concatenate([d2, e2], axis=-1))
        d1 = nn.ConvTranspose(8, (2, 2), strides=(2, 2), dtype=self.dtype)(d2)  # 180x320
        d1 = ConvBlock(8, self.dtype)(jnp.concatenate([d1, e1], axis=-1))
        return nn.Conv(self.output_channels, (1, 1), dtype=self.dtype)(d1)
