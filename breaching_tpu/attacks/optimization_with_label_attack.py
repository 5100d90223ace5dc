"""Joint data + label optimization (original DLG; Zhu et al.).

TPU-native counterpart of reference
breaching/attacks/optimization_with_label_attack.py (OptimizationJointAttacker).
Because the base attack already optimizes a candidate *pytree*, the joint variant
only has to add a `labels` leaf (soft label logits) — the same jitted scan then
advances data and labels together, and the softmax labels flow through the task
loss (the reference threads labels.softmax into the objective closure,
reference:160-175).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .optimization_based_attack import OptimizationBasedAttacker


class OptimizationJointAttacker(OptimizationBasedAttacker):
    """Optimizes candidate data and soft labels jointly."""

    supports_fleet = False  # loss/reconstruct stages ignore the fleet `extra` channel

    def reconstruct(self, server_payload, shared_data, server_secrets=None,
                    initial_data=None, dryrun=False):
        if shared_data[0]["metadata"]["labels"] is not None:
            raise ValueError(
                "Joint optimization only makes sense if no labels are provided. "
                "Switch to attack.attack_type=optimization instead.")
        metadata = server_payload[0]["metadata"]
        self._num_classes = metadata.get("classes")
        self._task = metadata.get("task", "classification")
        self._vocab_size = metadata.get("vocab_size")
        return super().reconstruct(server_payload, shared_data, server_secrets,
                                   initial_data, dryrun)

    def prepare_attack(self, server_payload, shared_data):
        # Skip fixed-formula label recovery entirely (labels are optimized).
        saved_strategy = self.cfg.label_strategy
        self.cfg.label_strategy = None
        rec_models, labels, stats = super().prepare_attack(server_payload, shared_data)
        self.cfg.label_strategy = saved_strategy
        return rec_models, None, stats

    def _init_candidate_tree(self, num_points, key, labels):
        key_data, key_labels = jax.random.split(key)
        tree = super()._init_candidate_tree(num_points, key_data, labels)
        if self._task == "classification":
            label_shape = (num_points, self._num_classes)
        else:  # sequence tasks: per-position soft tokens
            label_shape = (num_points, self.data_shape[0], self._vocab_size)
        tree["labels"] = jax.random.normal(key_labels, label_shape)
        return tree

    def _effective_labels(self, candidate_tree, labels):
        return jax.nn.softmax(candidate_tree["labels"], axis=-1)

    def _extract_solution(self, optimal_tree, labels):
        recovered = jnp.argmax(optimal_tree["labels"], axis=-1)
        return dict(data=optimal_tree["data"], labels=recovered)
