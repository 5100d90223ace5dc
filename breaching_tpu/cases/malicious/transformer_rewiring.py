"""Decepticon transformer parameter rewiring (Fowl et al., "Decepticons").

TPU-native counterpart of reference
breaching/cases/malicious_modifications/analytic_transformer_utils.py and the
orchestration in breaching/cases/servers.py:384-523. All modifications are pure
pytree edits on the flax TransformerModel parameters (kernel layout (in, out) —
the reference's "ff_transposed" case):

- embedding components [0:v] are disabled; positions are normalized,
- the first attention is rewired into a positional copy machine: Q bias carries a
  hugely-scaled positional key, K = I, V moves position components [v:2v] into
  [0:v], so every token in a sequence receives the same "sentence key",
- middle attentions are disabled, second FF layers become tiny flow-through,
- every first FF layer becomes a cumulative imprint layer: all hidden columns
  measure <feature, probe> against Gaussian-CDF bins calibrated on the model's
  own feature distribution (estimated from random tokens or external data),
- the last attention is zeroed (causal) or equalized (masked-lm).

Secrets record the FF-layer pytree paths, v_length, and bin structure.
"""

from __future__ import annotations

import logging
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as normal_dist

log = logging.getLogger(__name__)


def _fetch(tree, path):
    node = tree
    for key in path:
        node = node[key]
    return node


def _positional_table(module, params, seq_len):
    if module.positional_embedding == "fixed":
        from ..models.language_models import fixed_positional_encoding

        return np.asarray(fixed_positional_encoding(module.max_len, module.ninp))[:seq_len]
    return np.asarray(params["pos_embedding"])[:seq_len]


def reconfigure_transformer(model, loss_fn, cfg_server, cfg_data, setup, external_dataloader=None):
    """Apply the full Decepticon parameter rewiring; returns (model, secrets)."""
    from ..models.language_models import TransformerModel

    if not isinstance(model.module, TransformerModel):
        raise ValueError(
            f"Transformer rewiring is implemented for the flax TransformerModel family "
            f"(got {model.name}); register new architectures in the model registry first.")

    pmod = cfg_server.param_modification
    v_length = int(pmod.v_length)
    seq_len = int(cfg_data.shape[0])
    module = model.module
    D, H = module.ninp, module.nhid
    nlayers = module.nlayers
    registry = model.aux["registry"]
    params = jax.tree_util.tree_map(lambda x: np.array(x, copy=True), model.params)

    rng = np.random.default_rng(int(pmod.get("seed", 0) or 0))

    # --- measurement probes, one per layer (reference: servers.py:418-429) ---
    def make_measurement():
        probe_dim = D - v_length - 1
        weights = rng.standard_normal(probe_dim)
        probe = (weights - weights.mean()) / weights.std() / math.sqrt(probe_dim)
        probe = probe * float(pmod.measurement_scale)
        m = np.zeros(D, np.float32)
        m[v_length:-1] = probe
        return m

    measurements = [make_measurement() for _ in range(nlayers)]
    measurement = measurements[0]

    # --- embedding modifications (reference: partially_disable_embedding:60-67) ---
    params["embedding"][:, :v_length] = 0.0
    if "pos_embedding" in params:
        pos = params["pos_embedding"]
        pos[:, :v_length] = 0.0
        norms = np.linalg.norm(pos[:, v_length:2 * v_length], axis=1, keepdims=True)
        params["pos_embedding"] = pos / np.maximum(norms, 1e-8)

    positions = _positional_table(module, params, seq_len)

    # --- first attention: positional copy machine (reference: _set_default_MHA) ---
    first_qkv = _fetch(params, registry["attention_qkv"][0])
    kernel = np.zeros_like(first_qkv["kernel"])          # (D, 3D)
    bias = np.zeros_like(first_qkv["bias"])              # (3D,)
    imprint_pos = int(pmod.imprint_sentence_position)
    softmax_skew = float(pmod.softmax_skew)
    # Q: zero kernel, bias = skewed positional key
    bias[v_length:2 * v_length] = softmax_skew * positions[imprint_pos, v_length:2 * v_length]
    # K: identity
    kernel[:, D:2 * D] = np.eye(D)
    # V: move components [v:2v] into [0:v]
    v_kernel = np.zeros((D, D), np.float32)
    v_kernel[v_length:2 * v_length, :v_length] = np.eye(v_length)
    kernel[:, 2 * D:] = v_kernel
    v_bias = np.zeros(D, np.float32)
    v_bias[imprint_pos:imprint_pos + v_length] = -positions[imprint_pos, v_length:2 * v_length]
    bias[2 * D:] = v_bias
    first_qkv["kernel"], first_qkv["bias"] = kernel, bias

    first_out = _fetch(params, registry["attention_out"][0])
    first_out["kernel"] = float(pmod.sequence_token_weight) * np.eye(D, dtype=np.float32)
    first_out["bias"] = np.zeros_like(first_out["bias"])

    # --- second FF layers: tiny flow-through (reference: set_flow_backward_layer:239-252) ---
    eps = float(pmod.eps)
    for path in registry["ff_second"]:
        layer = _fetch(params, path)
        k = np.zeros_like(layer["kernel"])               # (H, D)
        k[:, -1] = eps / k.shape[0]
        layer["kernel"] = k
        layer["bias"] = np.zeros_like(layer["bias"])

    # --- middle attentions disabled (reference: disable_mha_layers:255-263) ---
    for path in registry["attention_out"][1:-1]:
        layer = _fetch(params, path)
        layer["kernel"] = np.zeros_like(layer["kernel"])
        layer["bias"] = np.zeros_like(layer["bias"])

    # --- last attention (reference: equalize_mha_layer:266-313) ---
    if nlayers > 1:
        last_qkv = _fetch(params, registry["attention_qkv"][-1])
        last_out = _fetch(params, registry["attention_out"][-1])
        if cfg_data.task == "masked-lm" and not cfg_data.get("disable_mlm", False):
            kernel = np.zeros_like(last_qkv["kernel"])
            kernel[:, D:2 * D] = np.eye(D)
            kernel[:, 2 * D:] = np.eye(D)
            last_qkv["kernel"] = kernel
            last_qkv["bias"] = np.zeros_like(last_qkv["bias"])
            last_out["kernel"] = float(pmod.equalize_token_weight) * np.eye(D, dtype=np.float32)
            last_out["bias"] = np.zeros_like(last_out["bias"])
        else:
            last_out["kernel"] = np.zeros_like(last_out["kernel"])
            last_out["bias"] = np.zeros_like(last_out["bias"])

    model.params = jax.tree_util.tree_map(jnp.asarray, params)

    # --- calibrate feature distribution, then set imprint bins ---
    # bin_setup (reference: servers.py:487-501): 'concatenate' spreads one
    # measurement's bins across all layers; 'separate' gives each layer its own
    # probe and bin range; 'repeat' reuses probe 0 with per-layer calibration.
    bin_setup = str(pmod.get("bin_setup", "concatenate"))
    params = jax.tree_util.tree_map(lambda x: np.array(x, copy=True), model.params)
    all_bins = []
    if bin_setup == "concatenate":
        mu, std = _feature_distribution(model, measurement, cfg_data,
                                        external_dataloader, layer=0)
        log.info(f"Feature mean is {mu:.4f}, feature std is {std:.4f}.")
        bins = _gaussian_bins(mu, std, H * nlayers)
        for i, path in enumerate(registry["ff_first"]):
            layer = _fetch(params, path)
            layer["kernel"] = np.tile(measurement[:, None], (1, H)).astype(np.float32)
            layer["bias"] = -np.asarray(bins[i * H:(i + 1) * H], np.float32)
        all_bins = bins
    elif bin_setup in ("separate", "repeat"):
        for i, path in enumerate(registry["ff_first"]):
            probe = measurements[i] if bin_setup == "separate" else measurements[0]
            mu, std = _feature_distribution(model, probe, cfg_data,
                                            external_dataloader, layer=i)
            log.info(f"Layer {i}: feature mean {mu:.4f}, std {std:.4f}.")
            bins = _gaussian_bins(mu, std, H)
            layer = _fetch(params, path)
            layer["kernel"] = np.tile(probe[:, None], (1, H)).astype(np.float32)
            layer["bias"] = -np.asarray(bins, np.float32)
            all_bins.extend(bins)
    else:
        raise ValueError(f"Invalid bin setup {bin_setup} given.")
    model.params = jax.tree_util.tree_map(jnp.asarray, params)

    secrets = dict(ImprintBlock=dict(
        weight_paths=list(registry["ff_first"]),
        bias_paths=[(*p, "bias") for p in registry["ff_first"]],
        data_shape=tuple(cfg_data.shape),
        structure="cumulative" if bin_setup == "concatenate" else "cumulative-per-layer",
        v_length=v_length,
        bins=all_bins,
        measurement=measurement,
        bin_setup=bin_setup,
        hidden_dim=H,
    ))
    return model, secrets


def _gaussian_bins(mu, std, num_bins):
    """Inverse-CDF bins of N(mu, std) (reference: make_imprint_layer:316-344)."""
    bins = [-10.0]
    for i in range(1, num_bins):
        bins.append(float(normal_dist.ppf(i / num_bins)) * std + mu)
    return bins


def _feature_distribution(model, measurement, cfg_data, external_dataloader,
                          num_batches=20, layer=0):
    """Mean/std of <ff_input, measurement> on the rewired model
    (reference: compute_feature_distribution:8-57 — a forward hook with an early
    RuntimeError exit; here the FF inputs are sown intermediates)."""
    registry = model.aux["registry"]
    probe = jnp.asarray(measurement)

    @jax.jit
    def batch_features(params, inputs):
        _, aux = model.apply(params, {}, inputs, train=True, capture=True)
        inter = aux.get("intermediates", {})
        ff_in = _fetch(inter, (f"layer{layer}", "ff_input"))[0]
        return ff_in.reshape(-1, ff_in.shape[-1]) @ probe

    rng = np.random.default_rng(1)
    samples = []
    if external_dataloader is not None:
        for i, batch in enumerate(external_dataloader):
            samples.append(np.asarray(batch_features(model.params, jnp.asarray(batch["input_ids"]))))
            if i + 1 >= num_batches:
                break
    else:
        batch = int(cfg_data.batch_size)
        seq = int(cfg_data.shape[0])
        for _ in range(num_batches):
            tokens = rng.integers(0, int(cfg_data.vocab_size), (batch, seq))
            samples.append(np.asarray(batch_features(model.params, jnp.asarray(tokens))))
    flat = np.concatenate(samples)
    return float(flat.mean()), float(flat.std())
