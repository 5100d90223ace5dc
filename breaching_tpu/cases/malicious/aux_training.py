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


def _nearest_indices(z, emb):
    """Nearest codebook entry per row: z (N, d), emb (d, K) -> (N,) indices.

    One MXU matmul instead of the reference's broadcasted (N, d, K) distance
    tensor (reference aux_training/nearest_embed.py:36-48):
    argmin_k ||z - e_k||^2 == argmin_k (||e_k||^2 - 2 z.e_k).
    """
    # HIGHEST precision: at the TPU default (bf16 passes), score gaps between
    # nearby ~0.02-scale codes fall below bf16 resolution and flip assignments.
    scores = jnp.sum(emb * emb, axis=0)[None, :] - 2.0 * jnp.matmul(
        z, emb, precision=jax.lax.Precision.HIGHEST)
    return jnp.argmin(scores, axis=-1)


@jax.custom_vjp
def nearest_embed(z, emb):
    """Vector quantization with straight-through gradients (reference
    aux_training/nearest_embed.py NearestEmbedFunc): forward snaps each row of
    z (N, d) to its nearest column of emb (d, K); backward passes the output
    gradient straight through to z, and scatters the per-row gradients onto the
    selected codebook columns averaged by assignment count (reference :55-72).
    """
    return emb.T[_nearest_indices(z, emb)]


def _nearest_embed_fwd(z, emb):
    idx = _nearest_indices(z, emb)
    return emb.T[idx], (idx, emb.shape[1])


def _nearest_embed_bwd(res, g):
    idx, num_emb = res
    onehot = jax.nn.one_hot(idx, num_emb, dtype=g.dtype)          # (N, K)
    counts = jnp.maximum(onehot.sum(axis=0), 1.0)
    grad_emb = (g.T @ onehot) / counts[None, :]                   # (d, K)
    return g, grad_emb


nearest_embed.defvjp(_nearest_embed_fwd, _nearest_embed_bwd)


def nearest_embed_ema(z, state, decay: float = 0.99, eps: float = 1e-5,
                      train: bool = True):
    """EMA-codebook vector quantization (reference nearest_embed.py
    NearestEmbedEMA:96-144, the sonnet/VQ-VAE-2 variant): the codebook is a
    buffer updated by exponential moving averages of assignment counts and
    assigned-vector sums instead of gradients. Functional: pass and re-thread
    `state = dict(weight (d,K), cluster_size (K,), embed_avg (d,K))`; returns
    (quantized (N,d), new_state). Jittable (static train flag)."""
    weight = state["weight"]
    idx = _nearest_indices(z, weight)
    quantized = weight.T[idx]
    if not train:
        return quantized, state
    onehot = jax.nn.one_hot(idx, weight.shape[1], dtype=z.dtype)      # (N, K)
    counts = onehot.sum(axis=0)
    embed_sum = z.T @ onehot                                          # (d, K)
    cluster_size = state["cluster_size"] * decay + (1 - decay) * counts
    embed_avg = state["embed_avg"] * decay + (1 - decay) * embed_sum
    n = cluster_size.sum()
    denom = (cluster_size + eps) / (n + weight.shape[1] * eps) * n
    new_weight = embed_avg / denom[None, :]
    return quantized, dict(weight=new_weight, cluster_size=cluster_size,
                           embed_avg=embed_avg)


def init_ema_codebook(key, emb_dim: int, num_embeddings: int):
    """Fresh NearestEmbedEMA state (reference nearest_embed.py:99-107)."""
    weight = jax.random.uniform(key, (emb_dim, num_embeddings))
    return dict(weight=weight, cluster_size=jnp.zeros(num_embeddings),
                embed_avg=weight)


# (vq_coef, commit_coef) per quantized arch — reference VAE.py VQ_VAE:69
# (vq 0.2, mse 0.4) and VQ_CVAE:98 (vq 1, commit 0.5).
_VQ_COEFS = {"VQ_VAE": (0.2, 0.4), "VQ_CVAE": (1.0, 0.5)}


def train_encoder_decoder(data_shape, dataloader=None, steps: int = 500,
                          batch_size: int = 32, lr: float = 1e-3, seed: int = 0,
                          arch: str = "VAE", num_embeddings: int = 512):
    """Train a small encoder/decoder; returns (decode_fn, params).

    `arch` selects the reference's four trainer variants (reference
    aux_training/VAE.py train_encoder_decoder:126-143): "AE" (plain MSE
    autoencoder), "VAE" (Gaussian reparameterization + KL), and "VQ_VAE" /
    "VQ_CVAE" (vector-quantized latents through `nearest_embed`, codebook
    trained with the vq + commitment losses of reference VAE.py:85-94,112-123).
    The whole loop is one jitted lax.scan over optax updates; with no
    dataloader it trains on smooth synthetic images (no dataset downloads in
    this environment)."""
    if arch not in ("AE", "VAE", "VQ_VAE", "VQ_CVAE"):
        raise ValueError(f"Invalid aux-training arch {arch}.")
    h, w, c = data_shape
    model = VAE(out_shape=(h, w, c))
    # independent streams for model init / codebook init / synthetic data, so
    # the codebook is not correlated with the data it is then trained on
    key, init_key, emb_key, data_key = jax.random.split(
        jax.random.PRNGKey(seed), 4)
    params = model.init(init_key, jnp.zeros((1, h, w, c)), init_key)["params"]
    if arch in _VQ_COEFS:
        # reference VQ_CVAE:108-110: normal(0, 0.02) clipped by fmod(0.04)
        emb0 = 0.02 * jax.random.normal(emb_key, (model.latent_dim, num_embeddings))
        params = dict(params, codebook=jnp.fmod(emb0, 0.04))
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
        data = jax.random.normal(data_key, (256, h, w, c)) * 0.5

    def _net(p):
        return {"params": {k: v for k, v in p.items() if k != "codebook"}}

    @jax.jit
    def step(carry, idx):
        params, opt_state, key = carry
        key, sub, batch_key = jax.random.split(key, 3)
        sel = jax.random.randint(batch_key, (batch_size,), 0, data.shape[0])
        batch = data[sel]

        def loss_fn(p):
            if arch == "VAE":
                rec, mu, logvar = model.apply(_net(p), batch, sub)
                kl = -0.5 * jnp.mean(1 + logvar - jnp.square(mu) - jnp.exp(logvar))
                return jnp.mean(jnp.square(rec - batch)) + 1e-3 * kl
            z_e, _ = model.apply(_net(p), batch, method=lambda m, x: m.encoder(x))
            if arch == "AE":
                rec = model.apply(_net(p), z_e, method=lambda m, z: m.decoder(z))
                return jnp.mean(jnp.square(rec - batch))
            # quantized archs: straight-through recon path trains the encoder
            # (reference VQ_CVAE.forward:112-116 weight_sg=True), the vq term
            # trains the codebook through nearest_embed's averaged scatter,
            # and the commitment term pins z_e to its code (reference :118-123)
            emb = p["codebook"]
            z_q = nearest_embed(z_e, jax.lax.stop_gradient(emb))
            emb_q = nearest_embed(jax.lax.stop_gradient(z_e), emb)
            rec = model.apply(_net(p), z_q, method=lambda m, z: m.decoder(z))
            vq_coef, commit_coef = _VQ_COEFS[arch]
            vq = jnp.mean(jnp.square(emb_q - jax.lax.stop_gradient(z_e)))
            commit = jnp.mean(jnp.square(jax.lax.stop_gradient(emb_q) - z_e))
            return (jnp.mean(jnp.square(rec - batch))
                    + vq_coef * vq + commit_coef * commit)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, key), loss

    (params, _, _), losses = jax.lax.scan(step, (params, opt_state, key), jnp.arange(steps))
    log.info(f"{arch} training finished: loss {float(losses[-1]):.4f} after {steps} steps.")

    def decode(z_or_x):
        """Decode latents (or re-encode+decode inputs) back to image space.
        Quantized archs snap latents to the trained codebook first, matching
        the decoder's training distribution."""
        arr = jnp.asarray(z_or_x)
        if not (arr.ndim == 2 and arr.shape[-1] == model.latent_dim):
            arr, _ = model.apply(_net(params), arr, method=lambda m, x: m.encoder(x))
        if arch in _VQ_COEFS:
            arr = nearest_embed(arr, params["codebook"])
        return model.apply(_net(params), arr, method=lambda m, z: m.decoder(z))

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
