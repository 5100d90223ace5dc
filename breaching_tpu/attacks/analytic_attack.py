"""Analytic (non-iterative) attacks: FC inversion, imprint readout, APRIL.

TPU-native counterpart of reference breaching/attacks/analytic_attack.py
(AnalyticAttacker:17-62, ImprintAttacker:65-153, AprilAttacker:827-896; the
DecepticonAttacker lives in decepticon_attack.py with the text stack).

These become batched XLA linear algebra: the imprint readout is a de-cumsum +
row-wise division; dynamic "hit" selection uses fixed-size top-k instead of
boolean indexing so everything stays jittable with static shapes.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from .base_attack import _BaseAttacker

log = logging.getLogger(__name__)


def invert_fc_layer(weight_grad, bias_grad, image_positions=None, eps=1e-12):
    """The FC inversion trick (reference: analytic_attack.py:51-62): the input to
    a linear layer reappears as weight_grad / bias_grad row-wise. weight_grad is
    (out, in), bias_grad is (out,). Rows with zero bias gradient are zeroed."""
    safe_bias = jnp.where(jnp.abs(bias_grad) > eps, bias_grad, jnp.inf)
    intermediates = weight_grad / safe_bias[:, None]
    if image_positions is None:
        return intermediates
    if len(image_positions) == 0:
        return intermediates
    if len(image_positions) == 1:
        valid = (jnp.abs(bias_grad) > eps).astype(weight_grad.dtype)
        return jnp.sum(intermediates * valid[:, None], axis=0) / jnp.maximum(valid.sum(), 1)
    return intermediates[jnp.asarray(image_positions)]


class AnalyticAttacker(_BaseAttacker):
    """Sanity-check analytic inversion for linear(+flatten) models
    (reference: analytic_attack.py:17-62)."""

    def __repr__(self):
        return f"Attacker (of type {self.__class__.__name__})."

    def reconstruct(self, server_payload, shared_data, server_secrets=None, dryrun=False):
        rec_models, labels, stats = self.prepare_attack(server_payload, shared_data)
        shared_data = self._shared_data_cache
        num_points = int(shared_data[0]["metadata"]["num_data_points"] or len(labels))

        inputs_from_queries = []
        for model, user_data in zip(rec_models, shared_data):
            w_grad, b_grad = model.head_grads(user_data["gradients"])
            if labels is not None and num_points > 1:
                layer_inputs = invert_fc_layer(w_grad, b_grad, np.asarray(labels))
            else:
                layer_inputs = invert_fc_layer(w_grad, b_grad, [0])[None]
            c, h, w = self.data_shape
            inputs = layer_inputs.reshape(num_points, h, w, c)
            inputs_from_queries.append(inputs)

        final = jnp.mean(jnp.stack(inputs_from_queries), axis=0)
        return dict(data=final, labels=labels), stats


class ImprintAttacker(AnalyticAttacker):
    """Readout of a malicious imprint block (reference: analytic_attack.py:65-153).

    Consumes `server_secrets["ImprintBlock"]` with pytree paths of the block's
    linear0 parameters (the functional replacement for gradient indices)."""

    def reconstruct(self, server_payload, shared_data, server_secrets=None, dryrun=False):
        rec_models, labels, stats = self.prepare_attack(server_payload, shared_data)
        shared_data = self._shared_data_cache
        if not server_secrets or "ImprintBlock" not in server_secrets:
            raise ValueError("No imprint hidden in this model according to the server.")
        secrets = server_secrets["ImprintBlock"]

        grads = shared_data[0]["gradients"]
        weight_grad = _fetch_path(grads, secrets["weight_path"])  # (N, K) flax layout
        bias_grad = _fetch_path(grads, secrets["bias_path"])      # (K,)
        weight_grad = jnp.transpose(weight_grad)                  # → (K, N)

        if self.cfg.get("sort_by_bias"):
            params_bias = _fetch_path(server_payload[0]["parameters"], secrets["bias_path"])
            order = jnp.argsort(-params_bias)
            bias_grad = bias_grad[order]
            weight_grad = weight_grad[order]

        if secrets["structure"] == "cumulative":
            # de-cumsum: bin_i -= bin_{i-1}, one fused diff on device
            weight_grad = jnp.concatenate(
                [weight_grad[:1], weight_grad[1:] - weight_grad[:-1]], axis=0)
            bias_grad = jnp.concatenate([bias_grad[:1], bias_grad[1:] - bias_grad[:-1]])

        layer_inputs = invert_fc_layer(weight_grad, bias_grad, None)
        layer_inputs, valid = self._reduce_hits(layer_inputs, weight_grad, bias_grad, shared_data)
        inputs = self._reformat_data(layer_inputs, rec_models, shared_data,
                                     server_payload, secrets)
        return dict(data=inputs, labels=labels), stats

    def _reduce_hits(self, layer_inputs, weight_grad, bias_grad, shared_data):
        """Pad or top-k-trim the recovered rows to num_data_points
        (reference: analytic_attack.py:105-128), with static shapes."""
        len_data = int(shared_data[0]["metadata"]["num_data_points"] or layer_inputs.shape[0])
        valid = jnp.abs(bias_grad) > 1e-12
        num_hits = int(np.asarray(valid.sum()))
        log.info(f"Initially produced {num_hits} hits.")

        reduction = self.cfg.get("breach_reduction", "weight")
        if reduction == "bias":
            score = jnp.where(valid, jnp.abs(bias_grad), jnp.inf)
        else:  # "weight" — robust under DP noise
            score = jnp.where(valid, jnp.abs(jnp.mean(weight_grad, axis=1)), jnp.inf)
        k = min(len_data, layer_inputs.shape[0])
        _, best = jax.lax.top_k(-score, k)
        best = jnp.sort(best)
        chosen = layer_inputs[best]
        if len_data > k and self.cfg.get("breach_padding", True):
            pad = jnp.zeros((len_data - k, *chosen.shape[1:]), chosen.dtype)
            chosen = jnp.concatenate([chosen, pad], axis=0)
        return chosen, valid

    def _reformat_data(self, layer_inputs, rec_models, shared_data, server_payload, secrets):
        metadata = server_payload[0]["metadata"]
        data_shape = secrets["shape"]  # NHWC for vision
        if "decoder" in secrets:
            # deep placements decode recovered features back to input space
            # (reference: analytic_attack.py:136-137)
            layer_inputs = secrets["decoder"](layer_inputs)
            data_shape = tuple(layer_inputs.shape[1:])
        if metadata.modality == "vision":
            inputs = layer_inputs.reshape(layer_inputs.shape[0], *data_shape)[..., :3]
            if inputs.shape[1:3] != tuple(self.data_shape[1:]):
                inputs = jax.image.resize(
                    inputs,
                    (inputs.shape[0], self.data_shape[1], self.data_shape[2], 3),
                    "cubic")
            dm = self.dm.reshape(1, 1, 1, -1)
            ds = self.ds.reshape(1, 1, 1, -1)
            return jnp.clip(inputs, -dm / ds, (1 - dm) / ds)
        # text: rows are token embeddings; re-identify nearest vocabulary entries
        inputs = layer_inputs.reshape(layer_inputs.shape[0], *data_shape)
        from .auxiliaries.text_utils import match_embeddings_to_tokens

        return match_embeddings_to_tokens(rec_models[0], inputs)


class AprilAttacker(AnalyticAttacker):
    """Closed-form ViT inversion (APRIL, Lu et al.;
    reference: analytic_attack.py:827-896): two least-squares solves — attention
    then patch embedding — followed by patch re-tiling. Solves run on-device via
    jnp.linalg.lstsq in float32 (the reference needs CPU float64 lapack gelsd;
    XLA's QR-based solve is stable here)."""

    def reconstruct(self, server_payload, shared_data, server_secrets=None, dryrun=False):
        rec_models, labels, stats = self.prepare_attack(server_payload, shared_data)
        shared_data = self._shared_data_cache
        len_data = int(shared_data[0]["metadata"]["num_data_points"] or 1)
        model = rec_models[0]

        x = self.closed_form_april(model, shared_data[0])
        dm = self.dm.reshape(1, 1, -1)
        ds = self.ds.reshape(1, 1, -1)
        inputs = jnp.clip(x, -dm / ds, (1 - dm) / ds)

        c, h, w = self.data_shape
        data = jnp.zeros((len_data, h, w, c), inputs.dtype)
        data = data.at[0].set(inputs)
        reconstructed = dict(data=data, labels=labels)
        if server_secrets and "ClassAttack" in server_secrets:
            info = server_secrets["ClassAttack"]
            full = jnp.zeros((info["true_num_data"], h, w, c), inputs.dtype)
            full = full.at[jnp.asarray(info["target_indx"]).reshape(-1)[0]].set(inputs)
            reconstructed = dict(data=full, labels=jnp.asarray(info["all_labels"]))
        return reconstructed, stats

    @staticmethod
    def closed_form_april(model, shared_data):
        """Two lstsq solves (reference: closed_form_april, analytic_attack.py:869-896).

        Solves run in float64 on host like the reference's gelsd path: the second
        solve inverts a (P*P*C x D) embedding with poor conditioning, where f32
        costs several dB of PSNR."""
        refs = {k: np.asarray(v, np.float64) for k, v in model.april_refs(model.params).items()}
        g_refs = {k: np.asarray(v, np.float64)
                  for k, v in model.april_refs(shared_data["gradients"]).items()}

        qkv_w = refs["qkv_kernel"]        # (D, 3D) flax layout
        qkv_g = g_refs["qkv_kernel"]
        # b = sum over q,k,v of W^T g (in flax (in, out) layout: W g^T contracting out)
        q_w, k_w, v_w = np.split(qkv_w, 3, axis=1)
        q_g, k_g, v_g = np.split(qkv_g, 3, axis=1)
        b = q_w @ q_g.T + k_w @ k_g.T + v_w @ v_g.T      # (D, D)

        A = g_refs["pos_embed"][0]                        # (T, D): grad of pos-embedding
        pos_embed = refs["pos_embed"][0]
        log.info(f"Attention Inversion: ||A||={np.linalg.norm(A):.3f}, ||b||={np.linalg.norm(b):.3f}")
        z = np.linalg.lstsq(A.T, b, rcond=None)[0]        # solve A^T z = b, (T, D)
        z = z - pos_embed
        z = z[1:]                                         # drop CLS token

        em_w = refs["patch_kernel"]                       # (P*P*C, D)
        em_b = refs["patch_bias"]
        x = z - em_b
        log.info(f"Embedding Inversion: ||A||={np.linalg.norm(em_w):.3f}, ||b||={np.linalg.norm(x):.3f}")
        patches = np.linalg.lstsq(em_w.T, x.T, rcond=None)[0]  # (P*P*C, T-1)
        return model.april_retile(jnp.asarray(patches, jnp.float32))


def _fetch_path(tree, path):
    node = tree
    for key in path:
        node = node[key]
    return node
