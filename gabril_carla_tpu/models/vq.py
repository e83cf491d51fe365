"""Straight-through vector quantizer (linear_models.py:19-75 parity, NHWC).

Distance computation is one MXU matmul per batch; argmin + one-hot matmul
replaces torch's scatter. Codebook init U(-1/K, 1/K).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct


@struct.dataclass
class VQOutput:
    quantized: jnp.ndarray  # [B, h, w, D], straight-through
    loss: jnp.ndarray  # [B] per-sample q + cc*e loss
    perplexity: jnp.ndarray  # scalar
    encoding_indices: jnp.ndarray  # [B, h*w] int32


class VectorQuantizer(nn.Module):
    embedding_dim: int
    num_embeddings: int
    commitment_cost: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> VQOutput:
        b, h, w, d = z.shape
        codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=2.0 / self.num_embeddings),
            (self.num_embeddings, self.embedding_dim),
        )
        # uniform(scale) is U(0, scale); recenter to U(-1/K, 1/K)
        codebook = codebook - 1.0 / self.num_embeddings

        flat = z.reshape(-1, d).astype(jnp.float32)
        dist = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)[None, :]
            - 2.0 * jnp.dot(flat, codebook.T, precision="highest")
        )
        idx = jnp.argmin(dist, axis=1)  # [B*h*w]
        quant_flat = codebook[idx]
        quantized = quant_flat.reshape(b, h, w, d)

        e_loss = jnp.mean((jax.lax.stop_gradient(quantized) - z) ** 2, axis=(1, 2, 3))
        q_loss = jnp.mean((quantized - jax.lax.stop_gradient(z)) ** 2, axis=(1, 2, 3))
        loss = q_loss + self.commitment_cost * e_loss

        # Straight-through estimator
        quantized_st = z + jax.lax.stop_gradient(quantized - z)

        onehot = jax.nn.one_hot(idx, self.num_embeddings, dtype=jnp.float32)
        avg_probs = jnp.mean(onehot, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

        return VQOutput(
            quantized=quantized_st,
            loss=loss,
            perplexity=perplexity,
            encoding_indices=idx.reshape(b, h * w).astype(jnp.int32),
        )
