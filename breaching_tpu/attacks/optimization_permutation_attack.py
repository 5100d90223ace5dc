"""Permutation-matrix optimization over leaked tokens.

TPU-native counterpart of reference
breaching/attacks/optimization_permutation_attack.py: all tokens are recovered
*before* optimization (embedding-layer leakage), and the attack only optimizes a
doubly-stochastic assignment of those tokens to positions. The candidate pytree
is the permutation matrix itself; Sinkhorn-Knopp projection runs inside the
jitted scan step (the reference's version contains dead code at its Sinkhorn
step — `torch.candidate_data`, reference:102 — and is repaired here with plain
alternating row/column normalization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .optimization_based_attack import OptimizationBasedAttacker


def sinkhorn_knopp(matrix, sub_iterations: int = 20, eps: float = 1e-9):
    """Project a nonnegative matrix onto (approximately) doubly-stochastic form."""

    def body(m, _):
        m = m / (m.sum(axis=1, keepdims=True) + eps)
        m = m / (m.sum(axis=0, keepdims=True) + eps)
        return m, None

    out, _ = jax.lax.scan(body, jnp.maximum(matrix, eps), None, length=sub_iterations)
    return out


class OptimizationPermutationAttacker(OptimizationBasedAttacker):
    """Optimizes token order given a leaked token bag."""

    supports_fleet = False  # loss/reconstruct stages ignore the fleet `extra` channel

    def reconstruct(self, server_payload, shared_data, server_secrets=None,
                    initial_data=None, dryrun=False):
        self._vocab_size = int(server_payload[0]["metadata"].vocab_size)
        return super().reconstruct(server_payload, shared_data, server_secrets,
                                   initial_data, dryrun)

    def prepare_attack(self, server_payload, shared_data):
        rec_models, labels, stats = super().prepare_attack(server_payload, shared_data)
        if labels is None:
            raise ValueError(
                "The permutation attack needs leaked tokens; set attack.token_strategy.")
        self._leaked_flat = jnp.asarray(labels).reshape(-1)
        self._num_points = int(shared_data[0]["metadata"]["num_data_points"] or 1)
        return rec_models, labels, stats

    # candidate = permutation logits over (positions x leaked tokens)
    def _init_candidate_tree(self, num_points, key, labels):
        P = self._leaked_flat.shape[0]
        return dict(data=jax.random.uniform(key, (P, P)))

    def _project_tree(self, candidate_tree, min_box, max_box):
        perm = jnp.clip(candidate_tree["data"], 0.0, 1.0)
        return dict(candidate_tree, data=sinkhorn_knopp(perm))

    def _build_loss_fn(self, rec_models, shared_data, labels, augmentation_key=None):
        params_list = tuple(m.params for m in rec_models)
        buffers_list = tuple(m.buffers for m in rec_models)
        grads_list = tuple(d["gradients"] for d in shared_data)
        objective = self.objective
        leaked = self._leaked_flat
        num_points = self._num_points
        seq_len = leaked.shape[0] // num_points
        embed_dim = self.data_shape[-1]
        vocab = self._vocab_size
        embeddings = self.embeddings  # set by prepare_text_attack

        def total_loss(candidate_tree, aug_key, extra=()):
            # `extra` (fleet mode) is unsupported here: permutation recovery is
            # inherently per-user (the leaked bag differs per experiment)
            perm = sinkhorn_knopp(jnp.clip(candidate_tree["data"], 0.0, 1.0))
            leaked_emb = embeddings[0]["weight"][leaked]                  # (P, D)
            candidate = (perm @ leaked_emb).reshape(num_points, seq_len, embed_dim)
            onehot = jax.nn.one_hot(leaked, vocab)                        # (P, V)
            soft_labels = (perm @ onehot).reshape(num_points, seq_len, vocab)
            total = jnp.zeros(())
            task_total = jnp.zeros(())
            for p, b, g in zip(params_list, buffers_list, grads_list):
                obj, task, _ = objective(p, b, g, candidate, soft_labels)
                total = total + obj
                task_total = task_total + task
            for reg in self.regularizers:
                total = total + reg(candidate, None)
            return total, task_total

        return total_loss

    def _score_all_trials(self, best_trees, labels, rec_models, shared_data):
        # score by the matching objective on the permuted embeddings
        scores = []
        total_loss = self._build_loss_fn(rec_models, shared_data, labels)
        score_fn = jax.jit(lambda tree: total_loss(tree, jax.random.PRNGKey(0))[0])
        num_trials = len(jax.tree_util.tree_leaves(best_trees)[0])
        for t in range(num_trials):
            tree = jax.tree_util.tree_map(lambda x: jnp.asarray(x[t]), best_trees)
            scores.append(float(score_fn(tree)))
        scores = np.asarray(scores)
        return np.where(np.isfinite(scores), scores, np.inf)

    def _extract_solution(self, optimal_tree, labels):
        from scipy.optimize import linear_sum_assignment

        perm = np.asarray(optimal_tree["data"])
        _, assignment = linear_sum_assignment(perm, maximize=True)
        leaked = np.asarray(self._leaked_flat)
        seq_len = leaked.shape[0] // self._num_points
        recovered = leaked[assignment].reshape(self._num_points, seq_len)
        return dict(data=jnp.asarray(recovered), labels=jnp.asarray(recovered))

    def _postprocess_text_data(self, reconstructed_data):
        return reconstructed_data  # tokens already recovered by the assignment
