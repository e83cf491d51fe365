"""VQ-VAE-style conv encoder/decoder, Flax/NHWC.

Geometry contract (vlm_gaze/models/linear_models.py:124-282): 180x320 input ->
three 4x4/s2/p1 convs (90x160 -> 45x80 -> 22x40) -> 3x3 valid conv (20x38) ->
residual stack -> two 5x5/p2 convs; decoder mirrors it back to 180x320 with the
reference's output-padding trick. Orthogonal weight init, relu gain for convs
(linear_models.py:6-16).

TPU-first notes: NHWC layout, bf16-friendly compute dtype knob (params stay
f32), explicit padding pairs so shapes match torch's floor-division conv
arithmetic on odd sizes (45 -> 22, not SAME's 23).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.gaze import gmd_dropout

# Orthogonal init with torch's relu gain for convs; plain orthogonal for dense.
conv_init = nn.initializers.orthogonal(scale=math.sqrt(2.0))
dense_init = nn.initializers.orthogonal()

P1 = ((1, 1), (1, 1))
P2 = ((2, 2), (2, 2))


class Residual(nn.Module):
    num_hiddens: int
    num_residual_hiddens: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.num_residual_hiddens, (3, 3), padding=P1, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.num_hiddens, (1, 1), use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype)(h)
        return x + h


class ResidualStack(nn.Module):
    num_hiddens: int
    num_residual_layers: int
    num_residual_hiddens: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_residual_layers):
            x = Residual(self.num_hiddens, self.num_residual_hiddens, self.dtype)(x)
        return nn.relu(x)


class Encoder(nn.Module):
    """Observation encoder; 180x320 -> 20x38 feature map.

    ``dropout_mask`` enables IGMD (gaze-modulated dropout after conv1/conv2,
    linear_models.py:191-199); at eval (`deterministic=True`) the expected-value
    form is used, matching the reference's test_mode.
    """

    embedding_dim: int = 64
    num_hiddens: int = 128
    num_residual_layers: int = 2
    num_residual_hiddens: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, dropout_mask=None, deterministic: bool = True):
        nh = self.num_hiddens
        x = nn.Conv(nh // 4, (4, 4), strides=2, padding=P1, kernel_init=conv_init, dtype=self.dtype)(x)
        x = nn.relu(x)
        if dropout_mask is not None:
            key = None if deterministic else self.make_rng("dropout")
            x = gmd_dropout(x, dropout_mask, key=key, test_mode=deterministic)
        x = nn.Conv(nh // 2, (4, 4), strides=2, padding=P1, kernel_init=conv_init, dtype=self.dtype)(x)
        x = nn.relu(x)
        if dropout_mask is not None:
            key = None if deterministic else self.make_rng("dropout")
            x = gmd_dropout(x, dropout_mask, key=key, test_mode=deterministic)
        x = nn.Conv(nh, (4, 4), strides=2, padding=P1, kernel_init=conv_init, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(nh, (3, 3), padding="VALID", kernel_init=conv_init, dtype=self.dtype)(x)
        x = ResidualStack(nh, self.num_residual_layers, self.num_residual_hiddens, self.dtype)(x)
        x = nn.Conv(nh, (5, 5), padding=P2, kernel_init=conv_init, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(self.embedding_dim, (5, 5), padding=P2, kernel_init=conv_init, dtype=self.dtype)(x)


class Decoder(nn.Module):
    """Mirror decoder; 20x38 -> 180x320 (output-padding trick on W of stage 2)."""

    out_channels: int = 1
    num_hiddens: int = 128
    num_residual_layers: int = 2
    num_residual_hiddens: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nh = self.num_hiddens
        x = nn.Conv(nh, (3, 3), padding=P1, kernel_init=conv_init, dtype=self.dtype)(x)
        x = ResidualStack(nh, self.num_residual_layers, self.num_residual_hiddens, self.dtype)(x)
        # torch ConvTranspose2d(k, s, p, output_padding=op) gives
        # out = (in-1)*s - 2p + k + op; flax explicit pads follow
        # out = (in-1)*s + 2 - k + pl + ph, so (pl, ph) = (k-1-p, k-1-p+op)
        # with the output padding landing on the high side like torch.
        x = nn.ConvTranspose(nh, (3, 3), strides=(1, 1), padding="VALID",
                             kernel_init=conv_init, dtype=self.dtype)(x)  # 22x40
        x = nn.relu(x)
        x = nn.ConvTranspose(nh // 2, (4, 4), strides=(2, 2), padding=((2, 3), (2, 2)),
                             kernel_init=conv_init, dtype=self.dtype)(x)  # 45x80
        x = nn.relu(x)
        x = nn.ConvTranspose(nh // 4, (4, 4), strides=(2, 2), padding=P2,
                             kernel_init=conv_init, dtype=self.dtype)(x)  # 90x160
        x = nn.relu(x)
        return nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2), padding=P2,
                                kernel_init=conv_init, dtype=self.dtype)(x)  # 180x320


class AutoEncoder(nn.Module):
    """Encoder+Decoder pair; the gaze-predictor model (linear_models.py:356-367)."""

    embedding_dim: int = 64
    num_hiddens: int = 128
    num_residual_layers: int = 2
    num_residual_hiddens: int = 32
    out_channels: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.embedding_dim, self.num_hiddens,
                               self.num_residual_layers, self.num_residual_hiddens, self.dtype)
        self.decoder = Decoder(self.out_channels, self.num_hiddens,
                               self.num_residual_layers, self.num_residual_hiddens, self.dtype)

    def __call__(self, x, encode_only: bool = False):
        z = self.encoder(x)
        if encode_only:
            return z
        return self.decoder(z)
