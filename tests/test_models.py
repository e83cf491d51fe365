"""Model geometry and behavior contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gabril_carla_tpu.models import (
    Actor,
    AutoEncoder,
    Decoder,
    Encoder,
    PreActor,
    UNet,
    VectorQuantizer,
)


def test_encoder_geometry_180x320_to_20x38():
    enc = Encoder(embedding_dim=16, num_hiddens=32, num_residual_layers=1, num_residual_hiddens=8)
    x = jnp.zeros((2, 180, 320, 2))
    z, _ = enc.init_with_output(jax.random.PRNGKey(0), x)
    assert z.shape == (2, 20, 38, 16)


def test_decoder_roundtrip_shape():
    dec = Decoder(out_channels=2, num_hiddens=32, num_residual_layers=1, num_residual_hiddens=8)
    z = jnp.zeros((2, 20, 38, 16))
    y, _ = dec.init_with_output(jax.random.PRNGKey(0), z)
    assert y.shape == (2, 180, 320, 2)


def test_autoencoder_shape():
    ae = AutoEncoder(embedding_dim=16, num_hiddens=32, num_residual_layers=1,
                     num_residual_hiddens=8, out_channels=1)
    x = jnp.zeros((1, 180, 320, 2))
    y, _ = ae.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, 180, 320, 1)


def test_encoder_igmd_dropout_paths():
    enc = Encoder(embedding_dim=8, num_hiddens=16, num_residual_layers=1, num_residual_hiddens=8)
    x = jnp.ones((2, 180, 320, 2))
    mask = jnp.ones((2, 180, 320, 2)) * 0.5
    params = enc.init(jax.random.PRNGKey(0), x)
    z_det = enc.apply(params, x, dropout_mask=mask, deterministic=True)
    z_tr = enc.apply(params, x, dropout_mask=mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert z_det.shape == z_tr.shape == (2, 20, 38, 8)
    assert not np.allclose(np.asarray(z_det), np.asarray(z_tr))


def test_heads_shapes():
    z = jnp.zeros((4, 20, 38, 8))
    pre = PreActor(z_dim=32)
    h, params = pre.init_with_output(jax.random.PRNGKey(0), z)
    assert h.shape == (4, 32)
    act = Actor(action_dim=7, z_dim=32)
    a, _ = act.init_with_output(jax.random.PRNGKey(0), h)
    assert a.shape == (4, 7)


def test_vq_straight_through_and_indices():
    vq = VectorQuantizer(embedding_dim=8, num_embeddings=32)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 6, 8))
    out, params = vq.init_with_output(jax.random.PRNGKey(0), z)
    assert out.quantized.shape == z.shape
    assert out.encoding_indices.shape == (2, 24)
    assert out.loss.shape == (2,)
    assert np.all(np.asarray(out.encoding_indices) >= 0)
    assert np.all(np.asarray(out.encoding_indices) < 32)

    # straight-through: gradient of sum(quantized) w.r.t. z is all-ones
    def f(zz):
        return jnp.sum(vq.apply(params, zz).quantized)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-6)


def test_unet_preserves_spatial_dims():
    unet = UNet(output_channels=1)
    x = jnp.zeros((1, 180, 320, 2))
    y, _ = unet.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, 180, 320, 1)
