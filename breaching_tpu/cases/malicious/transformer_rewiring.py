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


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = value


def _get_kernel(layer, layout):
    """Kernel in canonical (in, out) orientation. HF GPT-2's Conv1D stores
    (out, in) — registry kernel_layout='out_in' (the reference's
    'ff_transposed' distinction, transformer_dictionary.py)."""
    k = layer["kernel"]
    return k.T if layout == "out_in" else k


def _set_kernel(layer, kernel_in_out, layout):
    layer["kernel"] = (kernel_in_out.T if layout == "out_in"
                       else kernel_in_out).astype(layer["kernel"].dtype)


def positional_table(model, params, seq_len):
    """Pure positional encodings [seq_len, D] for any registered architecture."""
    registry = (model.aux or {}).get("registry", {})
    pos_path = registry.get("pos_embedding")
    if pos_path is not None:
        # roberta-style tables skip the first pad_token_id+1 rows at runtime
        off = int(registry.get("pos_offset", 0))
        return np.asarray(_fetch(params, pos_path))[off:off + seq_len]
    from ..models.language_models import fixed_positional_encoding

    module = model.module
    return np.asarray(fixed_positional_encoding(module.max_len, module.ninp))[:seq_len]


def reconfigure_transformer(model, loss_fn, cfg_server, cfg_data, setup, external_dataloader=None):
    """Apply the full Decepticon parameter rewiring; returns (model, secrets).

    Registry-driven: any architecture whose aux.registry lists per-layer
    attention_qkv (fused path or dict(query/key/value)), attention_out,
    ff_first, ff_second plus embedding/pos paths can be rewired — the flax
    TransformerModel family and the hf-gpt2 wrapper both qualify (the
    counterpart of reference transformer_dictionary.py:5-134)."""
    registry = (model.aux or {}).get("registry", {})
    if not registry.get("attention_qkv"):
        raise ValueError(
            f"Transformer rewiring needs a populated architecture registry "
            f"(got {model.name}); register attention/ff paths in model.aux first.")

    pmod = cfg_server.param_modification
    v_length = int(pmod.v_length)
    seq_len = int(cfg_data.shape[0])
    module = model.module
    D, H = int(model.aux["ninp"]), int(model.aux["nhid"])
    nlayers = int(registry.get("nlayers") or len(registry["attention_qkv"]))
    layout = registry.get("kernel_layout", "in_out")
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
    if pmod.get("reset_embedding"):
        # reinit to N(0,1) like torch nn.Embedding.reset_parameters
        # (reference servers.py:432-433) — gives the attacker separable token
        # embeddings on architectures with tiny embedding inits (BERT/GPT-2)
        shape = _fetch(params, registry["embedding"]).shape
        _set(params, registry["embedding"],
             rng.standard_normal(shape).astype(np.float32))
    embedding = _fetch(params, registry["embedding"])
    embedding[:, :v_length] = 0.0
    if registry.get("pos_embedding") is not None:
        pos = _fetch(params, registry["pos_embedding"])
        pos[:, :v_length] = 0.0
        norms = np.linalg.norm(pos[:, v_length:2 * v_length], axis=1, keepdims=True)
        _set(params, registry["pos_embedding"], pos / np.maximum(norms, 1e-8))

    positions = positional_table(model, params, seq_len)
    # the attention biases must carry positions AS THE FIRST BLOCK SEES THEM:
    # through the embedding LayerNorm where one exists (BERT), identity
    # otherwise (reference: set_MHA's norm_layer0(pos_encoder(zeros)))
    norm0_path = registry.get("embedding_norm")
    if norm0_path is not None:
        n0 = _fetch(params, norm0_path)
        mu = positions.mean(axis=-1, keepdims=True)
        var = positions.var(axis=-1, keepdims=True)
        attn_positions = ((positions - mu) / np.sqrt(var + 1e-12)
                          * np.asarray(n0["scale"]) + np.asarray(n0["bias"]))
    else:
        attn_positions = positions

    imprint_pos = int(pmod.imprint_sentence_position)
    softmax_skew = float(pmod.softmax_skew)

    def write_qkv(entry, q_kernel, q_bias, k_kernel, k_bias, v_kernel, v_bias):
        """Write per-head Q/K/V weights through a fused (D, 3D) path or a
        dict of separate query/key/value paths (BERT-style)."""
        if isinstance(entry, dict):
            for name, kern, bias_ in (("query", q_kernel, q_bias),
                                      ("key", k_kernel, k_bias),
                                      ("value", v_kernel, v_bias)):
                layer = _fetch(params, entry[name])
                _set_kernel(layer, kern, layout)
                layer["bias"] = bias_.astype(layer["bias"].dtype)
        else:
            layer = _fetch(params, entry)
            fused = np.concatenate([q_kernel, k_kernel, v_kernel], axis=1)
            _set_kernel(layer, fused, layout)
            layer["bias"] = np.concatenate([q_bias, k_bias, v_bias]).astype(
                layer["bias"].dtype)

    # --- first attention: positional copy machine (reference: _set_default_MHA) ---
    q_bias = np.zeros(D, np.float32)
    q_bias[v_length:2 * v_length] = softmax_skew * attn_positions[imprint_pos, v_length:2 * v_length]
    v_kernel = np.zeros((D, D), np.float32)
    v_kernel[v_length:2 * v_length, :v_length] = np.eye(v_length)
    v_bias = np.zeros(D, np.float32)
    v_bias[imprint_pos:imprint_pos + v_length] = -attn_positions[imprint_pos, v_length:2 * v_length]
    write_qkv(registry["attention_qkv"][0],
              np.zeros((D, D), np.float32), q_bias,
              np.eye(D, dtype=np.float32), np.zeros(D, np.float32),
              v_kernel, v_bias)

    first_out = _fetch(params, registry["attention_out"][0])
    _set_kernel(first_out, float(pmod.sequence_token_weight) * np.eye(D, dtype=np.float32),
                layout)
    first_out["bias"] = np.zeros_like(first_out["bias"])

    # --- second FF layers: tiny flow-through (reference: set_flow_backward_layer:239-252) ---
    eps = float(pmod.eps)
    for path in registry["ff_second"]:
        layer = _fetch(params, path)
        k = np.zeros((H, D), np.float32)
        k[:, -1] = eps / H
        _set_kernel(layer, k, layout)
        layer["bias"] = np.zeros_like(layer["bias"])

    # --- middle attentions disabled (reference: disable_mha_layers:255-263) ---
    for path in registry["attention_out"][1:-1]:
        layer = _fetch(params, path)
        layer["kernel"] = np.zeros_like(layer["kernel"])
        layer["bias"] = np.zeros_like(layer["bias"])

    # --- last attention (reference: equalize_mha_layer:266-313) ---
    if nlayers > 1:
        last_out = _fetch(params, registry["attention_out"][-1])
        if cfg_data.task == "masked-lm" and not cfg_data.get("disable_mlm", False):
            write_qkv(registry["attention_qkv"][-1],
                      np.zeros((D, D), np.float32), np.zeros(D, np.float32),
                      np.eye(D, dtype=np.float32), np.zeros(D, np.float32),
                      np.eye(D, dtype=np.float32), np.zeros(D, np.float32))
            _set_kernel(last_out,
                        float(pmod.equalize_token_weight) * np.eye(D, dtype=np.float32),
                        layout)
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
            _set_kernel(layer, np.tile(measurement[:, None], (1, H)).astype(np.float32),
                        layout)
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
            _set_kernel(layer, np.tile(probe[:, None], (1, H)).astype(np.float32), layout)
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
        kernel_layout=layout,
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
