"""Utilities for class/feature fishing attacks.

TPU-native counterpart of reference
breaching/cases/malicious_modifications/classattack_utils.py. Feature
reconstruction (W/b trick), KS-test feature selection, ground-truth statistics
estimation, and per-example gradient computation as one vmapped jax.grad.
"""

from __future__ import annotations

import numbers

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats


def wrap_indices(indices):
    if isinstance(indices, numbers.Number):
        return [indices]
    return list(indices)


def check_with_tolerance(value, values, threshold=1e-3):
    return any(abs(value - v) < threshold for v in values)


def reconstruct_feature(shared_data, cls_to_obtain, model):
    """Feature vector of the target class from head gradients
    (reference: classattack_utils.py:53-66)."""
    grads = shared_data["gradients"] if isinstance(shared_data, dict) else shared_data
    w_grad, b_grad = model.head_grads(grads)
    safe = jnp.where(jnp.abs(b_grad[:, None]) > 1e-12, b_grad[:, None], jnp.inf)
    debiased = w_grad / safe
    return jnp.where(jnp.abs(b_grad[cls_to_obtain]) > 1e-12,
                     debiased[cls_to_obtain], jnp.zeros_like(debiased[0]))


def cal_single_gradients(model, loss_fn, true_user_data):
    """Per-example flattened gradients + losses as one vmapped computation
    (reference loops examples in Python, classattack_utils.py:69-89)."""
    data = jnp.asarray(true_user_data["data"])
    labels = jnp.asarray(true_user_data["labels"])

    def one(x, y):
        def task(p):
            out, _ = model.apply(p, model.buffers, x[None], train=False)
            return loss_fn(out, y[None])

        loss, grads = jax.value_and_grad(task)(model.params)
        flat = jnp.concatenate([g.reshape(-1) for g in jax.tree_util.tree_leaves(grads)])
        return flat, loss

    return jax.vmap(one)(data, labels)


def order_gradients(recovered_single_gradients, gt_single_gradients):
    """Match recovered to true single gradients by cosine similarity + assignment
    (reference: classattack_utils.py:30-49)."""
    from scipy.optimize import linear_sum_assignment

    rec = np.stack([np.concatenate([np.asarray(g).reshape(-1) for g in
                                    jax.tree_util.tree_leaves(grad)])
                    for grad in recovered_single_gradients])
    gt = np.asarray(gt_single_gradients)
    rec_n = rec / np.maximum(np.linalg.norm(rec, axis=1, keepdims=True), 1e-10)
    gt_n = gt / np.maximum(np.linalg.norm(gt, axis=1, keepdims=True), 1e-10)
    similarity = gt_n @ rec_n.T
    try:
        _, assignment = linear_sum_assignment(similarity, maximize=True)
    except ValueError:
        assignment = list(range(len(rec)))
    return [recovered_single_gradients[i] for i in assignment]


def estimate_gt_stats(est_features, sample_sizes, indx=0):
    """Mean/std estimate of a feature across users, std corrected by sqrt(n)
    (reference: classattack_utils.py:126-136)."""
    feature = np.asarray(est_features[indx])
    aggregated = [f * (s ** 0.5) for f, s in zip(feature, sample_sizes)]
    return float(np.mean(feature)), float(np.std(aggregated))


def find_best_feat(est_features, sample_sizes, method="kstest"):
    """Pick the feature whose cross-user distribution is most Gaussian
    (reference: classattack_utils.py:138-162)."""
    est_features = np.asarray(est_features)
    if "kstest" in method:
        statistics = []
        for series in est_features:
            std = np.std(series)
            normed = (series - np.mean(series)) / (std if std > 0 else 1.0)
            statistics.append(stats.kstest(normed, "norm")[0])
        return int(np.argmin(statistics))
    if "most-spread" in method or "most-high-mean" in method:
        mus, sigmas = [], []
        for i in range(len(est_features)):
            mu, sigma = estimate_gt_stats(est_features, sample_sizes, indx=i)
            mus.append(mu)
            sigmas.append(sigma)
        return int(np.argmax(sigmas) if "most-spread" in method else np.argmax(mus))
    raise ValueError(f"Method {method} not implemented.")
