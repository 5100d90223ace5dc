"""Shared attack machinery: payload ingestion, label recovery, candidate setup.

TPU-native counterpart of reference breaching/attacks/base_attack.py (_BaseAttacker).
Since models are pure (apply_fn, params, buffers) triples, "reconstructing the
model from the payload" (reference:169-212) is just re-binding pytrees — no
deepcopy, no module mutation. Label recovery strategies (reference:305-475)
operate on the classification head's gradients through the model's `head_grads`
accessor instead of positional "last two leaves" conventions.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from .auxiliaries.initializations import init_candidate

log = logging.getLogger(__name__)


class _BaseAttacker:
    def __init__(self, model, loss_fn, cfg_attack, setup):
        self.model_template = model
        self.loss_fn = loss_fn
        self.cfg = cfg_attack
        self.setup = setup

    def reconstruct(self, server_payload, shared_data, server_secrets=None, dryrun=False):
        raise NotImplementedError

    def __repr__(self):
        raise NotImplementedError

    def prepare_attack(self, server_payload, shared_data):
        """Basic startup common to all attacks (reference: base_attack.py:43-74).

        Returns (rec_models, labels, stats).
        """
        stats = dict()
        shared_data = list(shared_data)
        server_payload = list(server_payload)

        metadata = server_payload[0]["metadata"]
        self.data_shape = tuple(metadata.shape)  # (C, H, W) reference convention
        self.modality = metadata.modality
        if metadata.get("mean") is not None:
            self.dm = jnp.asarray(metadata.mean, jnp.float32)  # channels-last broadcast
            self.ds = jnp.asarray(metadata.std, jnp.float32)
        else:
            self.dm, self.ds = jnp.zeros(1), jnp.ones(1)

        rec_models = self._construct_models_from_payload_and_buffers(server_payload, shared_data)
        shared_data = self._cast_shared_data(shared_data)
        if self.cfg.normalize_gradients:
            shared_data = self._normalize_gradients(shared_data)
        if self.modality == "text":
            from .auxiliaries.text_utils import prepare_text_attack

            shared_data = prepare_text_attack(self, shared_data, rec_models)
        self._shared_data_cache = shared_data

        labels = shared_data[0]["metadata"]["labels"]
        if labels is None:
            if self.modality == "text" and self.cfg.get("token_strategy"):
                from .auxiliaries.text_utils import recover_token_information

                labels = recover_token_information(self, shared_data, server_payload, rec_models[0])
            else:
                labels = self._recover_label_information(shared_data, server_payload, rec_models)
        else:
            labels = jnp.asarray(labels)
        return rec_models, labels, stats

    # ------------------------------------------------------------------ models

    def _construct_models_from_payload_and_buffers(self, server_payload, shared_data):
        """Bind payload parameters + best-available buffers into fresh JaxModels.

        Buffer priority mirrors the reference (base_attack.py:178-203): user-shared
        buffers > server-provided buffers > none (BatchNorm then runs in train
        mode on the candidate batch).
        """
        models = []
        for idx, payload in enumerate(server_payload):
            params = jax.tree_util.tree_map(jnp.asarray, payload["parameters"])
            user_buffers = shared_data[idx]["buffers"] if idx < len(shared_data) else None
            if user_buffers is not None:
                buffers, bn_train = user_buffers, False
            elif payload["buffers"] is not None:
                buffers, bn_train = payload["buffers"], False
            else:
                buffers = self.model_template.buffers
                bn_train = self.model_template.has_batchnorm
            model = dataclasses.replace(
                self.model_template, params=params,
                buffers=jax.tree_util.tree_map(jnp.asarray, buffers) if buffers else {})
            model.bn_train = bn_train
            models.append(model)
        return models

    def _cast_shared_data(self, shared_data):
        dtype = self.setup.get("dtype", jnp.float32)
        for data in shared_data:
            data["gradients"] = jax.tree_util.tree_map(
                lambda g: jnp.asarray(g, dtype), data["gradients"])
        return shared_data

    def _normalize_gradients(self, shared_data, fudge_factor=1e-6):
        for data in shared_data:
            norm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                                for g in jax.tree_util.tree_leaves(data["gradients"])))
            scale = 1.0 / jnp.maximum(norm, fudge_factor)
            data["gradients"] = jax.tree_util.tree_map(lambda g: g * scale, data["gradients"])
        return shared_data

    # ------------------------------------------------------------------ init

    def _initialize_data(self, data_shape_nhwc, key):
        dm = self.dm.reshape(1, 1, 1, -1)
        ds = self.ds.reshape(1, 1, 1, -1)
        return init_candidate(key, self.cfg.init, data_shape_nhwc, dm=dm, ds=ds,
                              dtype=self.setup.get("dtype", jnp.float32))

    @property
    def nhwc_shape(self):
        c, h, w = self.data_shape
        return (h, w, c)

    @property
    def candidate_shape(self):
        """Per-example shape of the optimization variable: HWC for vision,
        (seq, embed_dim) for text in the run-embedding strategy."""
        if self.modality == "text":
            return tuple(self.data_shape)
        return self.nhwc_shape

    # ------------------------------------------------------------------ labels

    def _recover_label_information(self, user_data, server_payload, rec_models):
        """Label recovery from head gradients (reference: base_attack.py:305-475).

        Runs host-side in numpy — the arrays involved are [classes] or
        [classes, features], trivial next to the attack loop.
        """
        num_data_points = user_data[0]["metadata"]["num_data_points"]
        strategy = self.cfg.label_strategy
        if strategy is None or str(strategy).lower() == "none":
            return None
        model = rec_models[0]
        head_grads = [tuple(np.asarray(x) for x in model.head_grads(d["gradients"]))
                      for d in user_data]
        num_classes = head_grads[0][1].shape[0]
        num_queries = len(user_data)
        rng = np.random.default_rng(np.asarray(
            jax.random.key_data(self.setup["key"]))[-1] if "key" in self.setup else 0)

        label_list: list[int] = []
        if strategy == "iDLG":
            for w_grad, _ in head_grads:
                label_list.append(int(np.argmin(w_grad.sum(axis=1))))
            labels = np.unique(label_list)
        elif strategy == "analytic":
            for _, b_grad in head_grads:
                label_list.extend(np.nonzero(b_grad < 0)[0].tolist())
            labels = np.unique(label_list)[:num_data_points]
        elif strategy == "yin":
            total_min_vals = sum(w_grad.min(axis=1) for w_grad, _ in head_grads)
            labels = np.argsort(total_min_vals)[:num_data_points]
        elif "wainakh" in str(strategy):
            if strategy == "wainakh-simple":
                m_impact = 0.0
                for w_grad, _ in head_grads:
                    g_i = w_grad.sum(axis=1)
                    m_query = np.where(g_i < 0, g_i, 0).sum() * (1 + 1 / num_classes) / num_data_points
                    m_impact += m_query / num_queries
                s_offset = np.zeros(num_classes)
            elif strategy == "wainakh-whitebox":
                m_impact, s_offset = self._wainakh_whitebox_estimates(
                    rec_models, num_data_points, num_classes, num_queries)
            else:
                raise ValueError(f"Invalid Wainakh strategy {strategy}.")
            g_i = np.stack([w.sum(axis=1) for w, _ in head_grads]).mean(axis=0)
            g_i = g_i.copy()
            selected = []
            for idx in range(num_classes):
                if g_i[idx] < 0:
                    selected.append(idx)
                    g_i[idx] -= m_impact
            g_i = g_i - s_offset
            while len(selected) < num_data_points:
                idx = int(np.argmin(g_i))
                selected.append(idx)
                g_i[idx] -= m_impact
            labels = np.asarray(selected)
        elif strategy == "bias-corrected":
            avg_bias = np.stack([b for _, b in head_grads]).mean(axis=0).copy()
            valid = np.nonzero(avg_bias < 0)[0]
            selected = valid.tolist()
            m_impact = avg_bias[valid].sum() / max(num_data_points, 1)
            avg_bias[valid] -= m_impact
            while len(selected) < num_data_points:
                idx = int(np.argmin(avg_bias))
                selected.append(idx)
                avg_bias[idx] -= m_impact
            labels = np.asarray(selected[:num_data_points]) if len(selected) > num_data_points \
                else np.asarray(selected)
        elif strategy == "bias-text":
            # Wainakh-style analytic recovery of ALL seq_len*n token "labels"
            # from decoder-bias gradients, seeded with the tokens whose
            # embedding rows received gradient (reference: base_attack.py:426-452).
            num_missing = num_data_points * int(self.data_shape[0])
            avg_bias = np.stack([b for _, b in head_grads]).mean(axis=0).copy()
            valid = np.nonzero(avg_bias < 0)[0]
            selected = valid.tolist()
            emb_path = (model.aux or {}).get("registry", {}).get("embedding")
            if emb_path is not None:
                emb_grad = user_data[0]["gradients"]
                for k in emb_path:
                    emb_grad = emb_grad[k]
                present = np.nonzero(
                    np.linalg.norm(np.asarray(emb_grad), axis=-1) > 0)[0]
                for token in present.tolist():
                    if token not in selected:
                        selected.append(token)
            m_impact = avg_bias[valid].sum() / max(num_missing, 1)
            avg_bias[valid] -= m_impact
            while len(selected) < num_missing:
                idx = int(np.argmin(avg_bias))
                selected.append(idx)
                avg_bias[idx] -= m_impact
            labels = np.asarray(selected[:num_missing]).reshape(
                num_data_points, int(self.data_shape[0]))
            log.info(f"Recovered {labels.size} tokens through strategy bias-text.")
            return jnp.asarray(labels)
        elif strategy == "random":
            labels = rng.integers(0, num_classes, num_data_points)
        elif strategy == "exhaustive":
            raise ValueError(
                f"Exhaustive label searching is not implemented — a naive search here would "
                f"try {num_classes ** num_data_points} label vectors.")
        else:
            raise ValueError(f"Invalid label recovery strategy {strategy} given.")

        labels = np.asarray(labels).reshape(-1)
        if len(labels) < num_data_points:
            labels = np.concatenate(
                [labels, rng.integers(0, num_classes, num_data_points - len(labels))])
        labels = np.sort(labels[:num_data_points])
        log.info(f"Recovered labels {labels.tolist()} through strategy {strategy}.")
        return jnp.asarray(labels)

    def _wainakh_whitebox_estimates(self, rec_models, num_data_points, num_classes, num_queries):
        """Measure label impact with dummy data (reference: base_attack.py:359-386).

        The reference loops the classes in Python with one autograd call each;
        here both estimation sweeps are vmapped over the class axis and run as
        two compiled programs."""
        from ..utils import split_key

        model = rec_models[0]
        h, w, c = self.nhwc_shape
        key = split_key(self.setup)

        def head_weight_grad(fake_data, fake_labels):
            def loss(p):
                out, _ = model.apply(p, model.buffers, fake_data, train=False)
                return self.loss_fn(out, fake_labels)
            grads = jax.grad(loss)(model.params)
            return model.head_grads(grads)[0]

        @jax.jit
        def m_sweep(base_key):
            def per_class(class_idx):
                fake_data = jax.random.normal(
                    jax.random.fold_in(base_key, class_idx), (num_data_points, h, w, c))
                fake_labels = jnp.full((num_data_points,), class_idx, jnp.int32)
                return head_weight_grad(fake_data, fake_labels).sum()
            return jax.vmap(per_class)(jnp.arange(num_classes)).sum()

        @jax.jit
        def s_sweep(base_key):
            t = num_classes - 1
            all_labels = jnp.arange(num_classes, dtype=jnp.int32)

            def per_class(class_idx):
                fake_data = jax.random.normal(
                    jax.random.fold_in(base_key, num_classes + class_idx), (t, h, w, c))
                # all labels except class_idx, as a static-shape selection
                shifted = jnp.where(all_labels >= class_idx, all_labels + 1, all_labels)[:t]
                w_cls = head_weight_grad(fake_data, shifted)
                return w_cls[class_idx].sum() / t
            return jax.vmap(per_class)(jnp.arange(num_classes))

        m_impact = float(m_sweep(key)) * (1 + 1 / num_classes) / num_data_points / num_classes / num_queries
        s_offset = np.asarray(s_sweep(key)) / num_queries
        return m_impact, s_offset
