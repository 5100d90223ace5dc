"""Malicious servers: model-modifying, transformer-rewiring, parameter-fishing.

TPU-native counterpart of reference breaching/cases/servers.py:171-895. Model
surgery here is functional composition: instead of splicing a torch Module into a
module list (reference `_place_malicious_block`, servers.py:240-278), the server
builds a wrapper flax module (imprint block in front of the victim) and re-binds
the JaxModel around it. Secrets record *pytree paths* of the malicious
parameters, which the imprint readout consumes directly — no positional
gradient-index bookkeeping.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..servers import HonestServer
from . import imprint as imprint_blocks

log = logging.getLogger(__name__)


class ImprintedModel(nn.Module):
    """Wrapper: malicious block runs on the input, victim model on its output."""

    block: nn.Module
    victim: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.block(x, train=train)
        return self.victim(x, train=train)


class MaliciousModelServer(HonestServer):
    """"Robbing the Fed" / "Curious Abandon Honesty" server: inserts an imprint
    block in front of the model (reference: servers.py:171-381)."""

    THREAT = "Malicious (analyst)"
    CANDIDATE_BLOCKS = dict(
        ImprintBlock=imprint_blocks.ImprintBlock,
        SparseImprintBlock=imprint_blocks.SparseImprintBlock,
        OneShotBlock=imprint_blocks.OneShotBlock,
        OneShotBlockSparse=imprint_blocks.OneShotBlockSparse,
        CuriousAbandonHonesty=imprint_blocks.CuriousAbandonHonesty,
    )

    def __init__(self, model, loss_fn, cfg_case, setup, external_dataloader=None):
        super().__init__(model, loss_fn, cfg_case, setup, external_dataloader)
        self.original_model = model

    def vet_model(self, model):
        """Place the malicious block and record its secrets."""
        cfg_mod = self.cfg_server.model_modification
        block_cls = self.CANDIDATE_BLOCKS[cfg_mod.type]
        modality = self.cfg_data.modality
        if modality == "vision":
            c, h, w = self.cfg_data.shape
            data_shape = (h, w, c)  # NHWC
        else:
            data_shape = tuple(self.cfg_data.shape)

        kwargs = dict(num_bins=int(cfg_mod.num_bins), connection=cfg_mod.get("connection", "linear"))
        for field in ("gain", "linfunc", "mode", "mu", "sigma", "scale_factor", "target_val"):
            if cfg_mod.get(field) is not None and field in {f.name for f in dataclasses.fields(block_cls)}:
                kwargs[field] = cfg_mod[field]
        block = block_cls(data_shape=data_shape, **kwargs)

        wrapped = ImprintedModel(block=block, victim=model.module)
        new_model = dataclasses.replace(
            model, module=wrapped, name=model.name,
            head_path=("victim",) + tuple(model.head_path))
        variables = wrapped.init(jax.random.PRNGKey(0), model.input_example, train=False)
        new_params = dict(variables["params"])
        # keep the victim's (possibly pretrained) parameters
        new_params["victim"] = model.params
        new_model.params = new_params
        new_model.buffers = ({"victim": model.buffers} if model.buffers else {})

        if float(self.cfg_server.get("model_gain", 1.0)) != 1.0:
            gain = float(self.cfg_server.model_gain)
            new_model.params["victim"] = jax.tree_util.tree_map(
                lambda p: p * gain, new_model.params["victim"])

        self.secrets["ImprintBlock"] = dict(
            weight_path=("block", "linear0_kernel"),
            bias_path=("block", "linear0_bias"),
            shape=data_shape,
            structure=block.structure,
        )
        self.model = new_model
        self.loss = self.loss  # unchanged
        for _ in range(int(self.cfg_server.get("normalize_rounds", 0) or 0)):
            self._normalize_throughput(new_model)
        return new_model

    def _normalize_throughput(self, model):
        """Rescale victim parameters so activations keep unit scale after the
        block insertion (reference: servers.py:314-366). Uses external or random
        data to measure per-layer activation std and folds the correction into
        conv/dense kernels layer by layer (one global correction here)."""
        if self.external_dataloader is not None:
            batch = next(iter(self.external_dataloader))["inputs"][:8]
            x = jnp.asarray(batch)
        else:
            c, h, w = self.cfg_data.shape
            x = jax.random.normal(jax.random.PRNGKey(7), (8, h, w, c))
        out, _ = model.apply(model.params, model.buffers, x, train=False)
        scale = jnp.std(out) + 1e-8
        head = model.params
        for key in model.head_path:
            head = head[key]
        node = head if "kernel" in head else head["dense"]
        node["kernel"] = node["kernel"] / scale
        if "bias" in node:
            node["bias"] = node["bias"] / scale


class MaliciousTransformerServer(HonestServer):
    """Decepticon server: rewires transformer parameters for analytic token
    recovery (reference: servers.py:384-523). Implemented against the flax
    text stack; see breaching_tpu/cases/malicious/transformer_rewiring.py."""

    THREAT = "Malicious (parameters)"

    def vet_model(self, model):
        from .transformer_rewiring import reconfigure_transformer

        model, secrets = reconfigure_transformer(
            model, self.loss, self.cfg_server, self.cfg_data, self.setup,
            external_dataloader=self.external_dataloader)
        self.secrets.update(secrets)
        self.model = model
        return model


class MaliciousClassParameterServer(HonestServer):
    """"Fishing" server: interactive multi-query protocol isolating single
    examples by class/feature parameter poisoning (reference: servers.py:526-895)."""

    THREAT = "Malicious (parameters)"

    def __init__(self, model, loss_fn, cfg_case, setup, external_dataloader=None):
        super().__init__(model, loss_fn, cfg_case, setup, external_dataloader)
        self.original_params = jax.tree_util.tree_map(jnp.asarray, model.params)

    def reset_model(self):
        self.model.params = jax.tree_util.tree_map(jnp.asarray, self.original_params)

    def run_protocol(self, user):
        """Interactive protocol: query for labels, then re-poison the classifier
        head per query to isolate a single target class/feature
        (reference: run_protocol 548-682, one_shot_binary_attack 716-739)."""
        cfg = self.cfg_server
        # Query 1: honest-looking query to recover labels from.
        payload = self.distribute_payload(query_id=0)
        shared, true_user_data = user.compute_local_updates(payload)
        w_grad, b_grad = self.model.head_grads(shared["gradients"])
        num_data = shared["metadata"]["num_data_points"] or 1
        t_labels = np.asarray(self._recover_labels(b_grad, num_data))
        log.info(f"Recovered labels {t_labels.tolist()} from first query.")

        target_cls = int(np.bincount(t_labels).argmax()) if len(t_labels) else 0
        target_indx = np.nonzero(t_labels == target_cls)[0]

        # Class attack: reweight the head so only the target class produces signal.
        self.reconfigure_for_class_attack(target_cls)
        payload = self.distribute_payload(query_id=1)
        shared, _ = user.compute_local_updates(payload)
        shared_data, payloads = [shared], [payload]

        if bool(cfg.get("one_shot_binary_attack", False)) and len(target_indx) > 1:
            shared_data, payloads = self._binary_attack_on_feature(
                user, target_cls, len(target_indx))

        self.secrets["ClassAttack"] = dict(
            num_data=len(target_indx),
            target_indx=target_indx,
            true_num_data=num_data,
            all_labels=jnp.asarray(t_labels),
        )
        self.reset_model()
        return shared_data, payloads, true_user_data

    def _recover_labels(self, bias_grad, num_data):
        bias = np.asarray(bias_grad).copy()
        valid = np.nonzero(bias < 0)[0]
        selected = valid.tolist()
        m_impact = bias[valid].sum() / max(num_data, 1)
        bias[valid] -= m_impact
        while len(selected) < num_data:
            idx = int(np.argmin(bias))
            selected.append(idx)
            bias[idx] -= m_impact
        return jnp.sort(jnp.asarray(selected[:num_data]))

    def reconfigure_for_class_attack(self, target_cls: int):
        """Zero all head rows except the target class, scaled by class_multiplier
        (reference: reconfigure_for_class_attack, servers.py:853-870)."""
        cfg = self.cfg_server
        params = jax.tree_util.tree_map(jnp.asarray, self.original_params)
        node = params
        for key in self.model.head_path:
            node = node[key]
        if "kernel" not in node:
            node = node["dense"]
        kernel = node["kernel"]  # (in, out)
        mask = jnp.zeros((kernel.shape[1],)).at[target_cls].set(1.0)
        node["kernel"] = kernel * mask[None, :] * float(cfg.get("class_multiplier", 0.5))
        node["bias"] = node["bias"] * mask
        self.model.params = params

    def reconfigure_for_feature_attack(self, target_cls: int, feature_idx: int,
                                       feature_val: float):
        """Bias the head so only examples whose feature exceeds feature_val
        produce gradient signal (reference: servers.py:872-895)."""
        cfg = self.cfg_server
        params = jax.tree_util.tree_map(jnp.asarray, self.original_params)
        node = params
        for key in self.model.head_path:
            node = node[key]
        if "kernel" not in node:
            node = node["dense"]
        kernel = jnp.zeros_like(node["kernel"])
        kernel = kernel.at[feature_idx, target_cls].set(float(cfg.get("feat_multiplier", 300)))
        node["kernel"] = kernel
        bias = jnp.zeros_like(node["bias"])
        bias = bias.at[target_cls].set(-float(cfg.get("feat_multiplier", 300)) * feature_val)
        node["bias"] = bias
        self.model.params = params

    def _binary_attack_on_feature(self, user, target_cls: int, num_collisions: int):
        """Binary search over a feature value until exactly one example remains
        (reference: one_shot_binary_attack, servers.py:716-739)."""
        feature_idx = int(self.cfg_server.get("grad_idx", 0))
        lo, hi = -3.0, 3.0
        shared_data, payloads = [], []
        for step in range(12):  # log2 search depth
            mid = (lo + hi) / 2
            self.reconfigure_for_feature_attack(target_cls, feature_idx, mid)
            payload = self.distribute_payload(query_id=2 + step)
            shared, _ = user.compute_local_updates(payload)
            _, b_grad = self.model.head_grads(shared["gradients"])
            hits = float(np.asarray(jnp.sum(jnp.abs(b_grad) > 1e-10)))
            if hits >= 1:
                lo = mid
            else:
                hi = mid
            shared_data, payloads = [shared], [payload]
            if abs(hi - lo) < 1e-3:
                break
        return shared_data, payloads
