"""FL servers: honest-but-curious plus malicious variants.

TPU-native counterpart of reference breaching/cases/servers.py
(HonestServer:64-168, MaliciousModelServer:171-381, MaliciousTransformerServer:384-523,
MaliciousClassParameterServer:526-895). In this functional design a "model
modification" is a transformation of the (module, params, buffers) triple — there
is no module mutation; malicious servers return new pytrees (and possibly a new
wrapped apply function), which keeps every payload reproducible.
"""

from __future__ import annotations

import copy
import logging

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def construct_server(model, loss_fn, cfg_case, setup, external_dataloader=None):
    """Server factory (reference: breaching/cases/servers.py:40-61)."""
    if cfg_case.server.has_external_data and external_dataloader is None:
        from .data import construct_dataloader

        external_dataloader = construct_dataloader(
            cfg_case.data, cfg_case.impl, user_idx=None, return_full_dataset=True)

    name = cfg_case.server.name
    if name in ("honest_but_curious", "honest-but-curious"):
        return HonestServer(model, loss_fn, cfg_case, setup, external_dataloader)
    if name == "malicious_model":
        from .malicious.servers import MaliciousModelServer

        return MaliciousModelServer(model, loss_fn, cfg_case, setup, external_dataloader)
    if name in ("malicious_transformer", "malicious_transformer_parameters"):
        from .malicious.servers import MaliciousTransformerServer

        return MaliciousTransformerServer(model, loss_fn, cfg_case, setup, external_dataloader)
    if name in ("class_malicious_parameters", "malicious_fishing"):
        from .malicious.servers import MaliciousClassParameterServer

        return MaliciousClassParameterServer(model, loss_fn, cfg_case, setup, external_dataloader)
    raise ValueError(f"Invalid server type {name}.")


class HonestServer:
    """An honest-but-curious server: distributes the model faithfully.

    Model states (reference: servers.py:109-133): default/trained keep the loaded
    parameters; untrained re-initializes; orthogonal re-initializes with orthogonal
    conv/dense kernels; linearized folds running stats into BN affine parameters;
    unchanged sends the current state untouched.
    """

    THREAT = "Honest-but-curious"

    def __init__(self, model, loss_fn, cfg_case, setup, external_dataloader=None):
        self.model = model
        self.loss = loss_fn
        self.cfg_case = cfg_case
        self.cfg_server = cfg_case.server
        self.cfg_data = cfg_case.data
        self.setup = setup
        self.num_queries = int(cfg_case.server.num_queries)
        self.external_dataloader = external_dataloader
        self.secrets = {}

    def __repr__(self):
        return f"""Server (of type {self.__class__.__name__}) with settings:
    Threat model: {self.THREAT}
    Number of planned queries: {self.num_queries}
    Has external/public data: {self.cfg_server.has_external_data}

    Model: {self.model.name}
    model state: {self.cfg_server.model_state}
    Secrets: {list(self.secrets.keys())}"""

    def reconfigure_model(self, model_state: str, query_id: int = 0):
        from ..utils import split_key

        if model_state in ("default", "trained", "unchanged", None):
            return
        if model_state == "untrained":
            key = jax.random.fold_in(split_key(self.setup), query_id)
            self.model.params, self.model.buffers = self.model.init_state(key)
        elif model_state == "orthogonal":
            key = jax.random.fold_in(split_key(self.setup), query_id)
            self.model.params, self.model.buffers = self.model.init_state(key)
            self.model.params = _orthogonalize_kernels(self.model.params, key)
        elif model_state == "linearized":
            self.model.params, self.model.buffers = _linearize_batchnorm(
                self.model.params, self.model.buffers)
        else:
            raise ValueError(f"Unknown model state {model_state}.")

    def reset_model(self):
        pass

    def distribute_payload(self, query_id: int = 0):
        """The payload *is* a pytree — no tensor refs to copy (reference: servers.py:138-147)."""
        self.reconfigure_model(self.cfg_server.model_state, query_id)
        buffers = self.model.buffers if (
            self.cfg_server.provide_public_buffers and self.model.has_batchnorm) else None
        return dict(parameters=self.model.params, buffers=buffers, metadata=self.cfg_data)

    def vet_model(self, model):
        """An honest server does not modify the model."""
        return self.model

    def queries(self):
        return range(self.num_queries)

    def run_protocol(self, user):
        """Simulate the full FL exchange (reference: servers.py:157-168)."""
        shared_user_data, payloads = [], []
        for query_id in self.queries():
            payload = self.distribute_payload(query_id)
            shared_data, true_user_data = user.compute_local_updates(payload)
            payloads.append(payload)
            shared_user_data.append(shared_data)
        return shared_user_data, payloads, true_user_data


def _orthogonalize_kernels(params, key):
    """Re-draw all conv/dense kernels as (semi-)orthogonal matrices."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    new_leaves = []
    for i, (path, leaf) in enumerate(leaves_with_paths):
        is_kernel = any(getattr(p, "key", None) == "kernel" for p in path)
        if is_kernel and leaf.ndim >= 2:
            subkey = jax.random.fold_in(key, i)
            flat = leaf.reshape(-1, leaf.shape[-1])
            ortho = jax.nn.initializers.orthogonal()(subkey, flat.shape, leaf.dtype)
            new_leaves.append(ortho.reshape(leaf.shape))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _linearize_batchnorm(params, buffers):
    """Fold running statistics into BN affine params and lift biases, making the
    network closer to a linear operator (reference: servers.py:118-125)."""
    params = copy.deepcopy(params)

    def visit(pnode, bnode):
        for key, val in list(pnode.items()):
            if isinstance(val, dict):
                if key in bnode and "mean" in bnode.get(key, {}) and "scale" in val:
                    val["scale"] = jnp.asarray(bnode[key]["var"])
                    val["bias"] = jnp.asarray(bnode[key]["mean"]) + 10.0
                elif "kernel" in val and "bias" in val \
                        and getattr(val["kernel"], "ndim", 0) == 4:
                    # biased convs get the same +10 lift (reference:123-124)
                    val["bias"] = jnp.asarray(val["bias"]) + 10.0
                elif key in bnode and isinstance(bnode[key], dict):
                    visit(val, bnode[key])
                else:
                    visit(val, bnode.get(key, {}) if isinstance(bnode.get(key), dict) else {})

    visit(params, buffers or {})
    return params, buffers
