"""MLP heads: pre-actor projection, actor, GRIL coordinate head, projector.

Parity: linear_models.py:302-353 and the inline heads built in
train/train_bc.py:79-86 (pre_actor = Flatten+Linear(z_dim);
actor = Linear-ReLU-Linear; gril head = Linear-ReLU-Linear(max_points*2)).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .encoder import dense_init


def mlp_head(hidden_dim: int | None, output_dim: int, hidden_depth: int):
    """Build an MLP spec equivalent to linear_models.mlp."""
    return MLP(hidden_dim=hidden_dim, output_dim=output_dim, hidden_depth=hidden_depth)


class MLP(nn.Module):
    output_dim: int
    hidden_dim: int | None = None
    hidden_depth: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.hidden_depth == 0:
            return nn.Dense(self.output_dim, kernel_init=dense_init, dtype=self.dtype)(x)
        x = nn.Dense(self.hidden_dim, kernel_init=dense_init, dtype=self.dtype)(x)
        x = nn.relu(x)
        for _ in range(self.hidden_depth - 1):
            x = nn.Dense(self.hidden_dim, kernel_init=dense_init, dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Dense(self.output_dim, kernel_init=dense_init, dtype=self.dtype)(x)


class PreActor(nn.Module):
    """Flatten + Linear to z_dim (train_bc.py:79)."""

    z_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        flat = z.reshape(z.shape[0], -1)
        return nn.Dense(self.z_dim, kernel_init=dense_init, dtype=self.dtype)(flat)


class Actor(nn.Module):
    """Linear(z,z) -> ReLU -> Linear(z, action_dim) (train_bc.py:81)."""

    action_dim: int = 7
    z_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h):
        h = nn.Dense(self.z_dim, kernel_init=dense_init, dtype=self.dtype)(h)
        h = nn.relu(h)
        return nn.Dense(self.action_dim, kernel_init=dense_init, dtype=self.dtype)(h)


class Projector(nn.Module):
    """General projection MLP (linear_models.py:343-353)."""

    out_dim: int
    hidden_dim: int = 256
    hidden_depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h):
        return MLP(self.out_dim, self.hidden_dim, self.hidden_depth, self.dtype)(h)
