"""Auxiliary encoder/decoder (VAE) training for malicious-model attacks.

TPU-native counterpart of reference breaching/cases/aux_training/VAE.py (181 LoC)
used when the imprint block is placed deeper in the model and the preceding
layers must be made invertible (handle_preceding_layers="VAE",
reference servers.py:368-381). The whole training loop is one jitted lax.scan
over optax updates on synthetic or external data.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

log = logging.getLogger(__name__)


class ConvEncoder(nn.Module):
    latent_dim: int = 128

    @nn.compact
    def __call__(self, x):
        for feats in (32, 64, 128):
            x = nn.relu(nn.Conv(feats, (3, 3), strides=(2, 2))(x))
        x = x.reshape(x.shape[0], -1)
        mu = nn.Dense(self.latent_dim, name="mu")(x)
        logvar = nn.Dense(self.latent_dim, name="logvar")(x)
        return mu, logvar


class ConvDecoder(nn.Module):
    out_shape: tuple  # (H, W, C)

    @nn.compact
    def __call__(self, z):
        h, w, c = self.out_shape
        h0, w0 = max(h // 8, 1), max(w // 8, 1)
        x = nn.Dense(h0 * w0 * 128)(z).reshape(z.shape[0], h0, w0, 128)
        for feats in (128, 64, 32):
            x = nn.relu(nn.ConvTranspose(feats, (3, 3), strides=(2, 2))(x))
        x = nn.Conv(c, (3, 3))(x)
        return jax.image.resize(x, (z.shape[0], h, w, c), "bilinear")


class VAE(nn.Module):
    out_shape: tuple
    latent_dim: int = 128

    def setup(self):
        self.encoder = ConvEncoder(self.latent_dim)
        self.decoder = ConvDecoder(self.out_shape)

    def __call__(self, x, key):
        mu, logvar = self.encoder(x)
        eps = jax.random.normal(key, mu.shape)
        z = mu + jnp.exp(0.5 * logvar) * eps
        return self.decoder(z), mu, logvar


def train_encoder_decoder(data_shape, dataloader=None, steps: int = 500,
                          batch_size: int = 32, lr: float = 1e-3, seed: int = 0):
    """Train a small VAE; returns (decode_fn, params). With no dataloader, trains
    on smooth synthetic images (this environment has no dataset downloads)."""
    h, w, c = data_shape
    model = VAE(out_shape=(h, w, c))
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, h, w, c)), key)["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    if dataloader is not None:
        batches = []
        for batch in dataloader:
            batches.append(jnp.asarray(batch["inputs"]))
            if len(batches) * batches[0].shape[0] >= steps:
                break
        data = jnp.concatenate(batches)
    else:
        data = jax.random.normal(key, (256, h, w, c)) * 0.5

    @jax.jit
    def step(carry, idx):
        params, opt_state, key = carry
        key, sub, batch_key = jax.random.split(key, 3)
        sel = jax.random.randint(batch_key, (batch_size,), 0, data.shape[0])
        batch = data[sel]

        def loss_fn(p):
            rec, mu, logvar = model.apply({"params": p}, batch, sub)
            rec_loss = jnp.mean(jnp.square(rec - batch))
            kl = -0.5 * jnp.mean(1 + logvar - jnp.square(mu) - jnp.exp(logvar))
            return rec_loss + 1e-3 * kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, key), loss

    (params, _, _), losses = jax.lax.scan(step, (params, opt_state, key), jnp.arange(steps))
    log.info(f"VAE training finished: loss {float(losses[-1]):.4f} after {steps} steps.")

    def decode(z_or_x):
        """Decode latents (or re-encode+decode inputs) back to image space."""
        arr = jnp.asarray(z_or_x)
        if arr.ndim == 2 and arr.shape[-1] == model.latent_dim:
            return model.apply({"params": params}, arr, method=lambda m, z: m.decoder(z))
        mu, _ = model.apply({"params": params}, arr,
                            method=lambda m, x: m.encoder(x))
        return model.apply({"params": params}, mu, method=lambda m, z: m.decoder(z))

    return decode, params


class FeatureDecoder(nn.Module):
    """Decode a prefix feature map back to input space (the compact counterpart
    of reference feat_decoders.py's ResNet-mirror decoders)."""

    out_shape: tuple      # (H, W, C)
    feature_shape: tuple  # (fh, fw, fc)
    width: int = 64

    @nn.compact
    def __call__(self, f):
        fh, fw, fc = self.feature_shape
        h, w, c = self.out_shape
        x = f.reshape(f.shape[0], fh, fw, fc)
        if (fh, fw) != (h, w):
            x = jax.image.resize(x, (f.shape[0], h, w, fc), "bilinear")
        for _ in range(2):
            x = nn.relu(nn.Conv(self.width, (3, 3))(x))
        return nn.Conv(c, (3, 3))(x)


def train_feature_decoder(prefix_fn, data_shape, feature_shape, dataloader=None,
                          steps: int = 800, batch_size: int = 16, lr: float = 2e-3,
                          seed: int = 0):
    """Train a decoder that inverts an ACTUAL prefix feature map:
    min ||D(prefix(x)) - x||^2 over probe data (reference feat_decoders.py +
    aux_training/VAE.py train decoders against the real model prefix; an
    untrained stack cannot do this job). The whole loop is one jitted lax.scan.

    prefix_fn: jittable x[N,H,W,C] -> features (any shape, flattened here).
    Returns (decode_fn, params); decode_fn accepts flattened feature rows.
    """
    h, w, c = data_shape
    decoder = FeatureDecoder(out_shape=(h, w, c), feature_shape=tuple(feature_shape))
    key = jax.random.PRNGKey(seed)

    if dataloader is not None:
        batches = []
        for batch in dataloader:
            batches.append(jnp.asarray(batch["inputs"]))
            if sum(b.shape[0] for b in batches) >= 256:
                break
        data = jnp.concatenate(batches)[:256]
    else:
        # no-egress fallback: smooth random images (low-pass filtered noise)
        noise = jax.random.normal(key, (256, h, w, c))
        small = jax.image.resize(noise, (256, max(h // 4, 1), max(w // 4, 1), c), "bilinear")
        data = jax.image.resize(small, noise.shape, "bilinear") + 0.1 * noise

    feats = jax.jit(prefix_fn)(data)
    feats = feats.reshape(feats.shape[0], -1)
    params = decoder.init(key, feats[:1])["params"]
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(carry, idx):
        params, opt_state, key = carry
        key, batch_key = jax.random.split(key)
        sel = jax.random.randint(batch_key, (batch_size,), 0, data.shape[0])

        def loss_fn(p):
            rec = decoder.apply({"params": p}, feats[sel])
            return jnp.mean(jnp.square(rec - data[sel]))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, key), loss

    (params, _, _), losses = jax.lax.scan(step, (params, opt_state, key),
                                          jnp.arange(steps))
    log.info(f"Feature decoder trained: loss {float(losses[0]):.4f} -> "
             f"{float(losses[-1]):.4f} after {steps} steps.")

    def decode(features):
        return decoder.apply({"params": params},
                             jnp.asarray(features).reshape(len(features), -1))

    return decode, params


def generate_decoder(feature_dim: int, data_shape, prefix_fn=None, dataloader=None,
                     feature_shape=None, seed: int = 0):
    """Feature-space decoder for deeper imprint placements (reference:
    feat_decoders.py generate_decoder). With a prefix_fn the decoder is TRAINED
    to invert it (the only useful mode); without one this degrades to an
    untrained stack and logs a warning."""
    h, w, c = data_shape
    if prefix_fn is not None:
        fshape = feature_shape or (1, 1, feature_dim)
        return train_feature_decoder(prefix_fn, data_shape, fshape,
                                     dataloader=dataloader, seed=seed)
    log.warning("generate_decoder called without a prefix_fn: the decoder is "
                "untrained and its readout will be garbage. Pass the model "
                "prefix to train it (see train_feature_decoder).")
    decoder = ConvDecoder(out_shape=(h, w, c))
    params = decoder.init(jax.random.PRNGKey(seed), jnp.zeros((1, feature_dim)))["params"]

    def decode(features):
        return decoder.apply({"params": params}, jnp.asarray(features))

    return decode, params
