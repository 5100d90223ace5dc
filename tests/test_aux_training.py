"""Aux encoder/decoder training: nearest-embed quantizer + the four archs
(reference breaching/cases/aux_training/{VAE,nearest_embed}.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from breaching_tpu.cases.malicious.aux_training import (
    nearest_embed, train_encoder_decoder)


def test_nearest_embed_forward_snaps_to_nearest():
    emb = jnp.array([[0.0, 1.0, -2.0],
                     [0.0, 1.0, -2.0]])  # (d=2, K=3): codes (0,0),(1,1),(-2,-2)
    z = jnp.array([[0.2, -0.1], [0.8, 1.3], [-1.0, -1.6]])
    out = nearest_embed(z, emb)
    np.testing.assert_allclose(out, [[0, 0], [1, 1], [-2, -2]])


def test_nearest_embed_straight_through_and_codebook_grad():
    emb = jnp.array([[0.0, 1.0], [0.0, 1.0]])  # codes (0,0) and (1,1)
    z = jnp.array([[0.1, 0.0], [0.9, 1.0], [1.1, 1.0]])  # -> codes 0, 1, 1

    # grad wrt z is the output cotangent, untouched (straight-through)
    g = jnp.arange(6.0).reshape(3, 2)
    gz = jax.vjp(lambda z_: nearest_embed(z_, emb), z)[1](g)[0]
    np.testing.assert_allclose(gz, g)

    # grad wrt emb: cotangents averaged over the rows assigned to each code
    # (reference nearest_embed.py:55-72)
    gemb = jax.vjp(lambda e: nearest_embed(z, e), emb)[1](g)[0]
    expected = np.stack([g[0], (g[1] + g[2]) / 2.0], axis=1)  # (d, K)
    np.testing.assert_allclose(gemb, expected)


@pytest.mark.parametrize("arch", ["AE", "VQ_VAE", "VQ_CVAE"])
def test_train_encoder_decoder_archs(arch):
    decode, params = train_encoder_decoder(
        (8, 8, 1), steps=20, batch_size=8, arch=arch, num_embeddings=16)
    if arch != "AE":
        assert params["codebook"].shape == (128, 16)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 1)) * 0.3
    rec = decode(x)  # re-encode + decode path
    assert rec.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(rec)).all()
    z = jax.random.normal(jax.random.PRNGKey(4), (2, 128)) * 0.02
    assert decode(z).shape == (2, 8, 8, 1)  # latent-rows path


def test_train_encoder_decoder_rejects_bad_arch():
    with pytest.raises(ValueError):
        train_encoder_decoder((8, 8, 1), steps=1, arch="GAN")


def test_nearest_embed_ema_moves_codes_toward_data():
    from breaching_tpu.cases.malicious.aux_training import (
        init_ema_codebook, nearest_embed_ema)

    state = init_ema_codebook(jax.random.PRNGKey(0), 2, 4)
    data = jnp.array([[5.0, 5.0]] * 8)  # one tight cluster far from init
    for _ in range(50):
        q, state = nearest_embed_ema(data, state, decay=0.8)
    # the winning code converges onto the cluster; eval mode freezes state
    assert float(jnp.min(jnp.linalg.norm(state["weight"].T - 5.0, axis=1))) < 0.5
    q2, state2 = nearest_embed_ema(data, state, train=False)
    assert state2 is state
    np.testing.assert_allclose(q2, q)
