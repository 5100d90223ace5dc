"""Task losses as pure functions over (logits, labels).

TPU-native counterparts of the reference's jit-scripted loss modules
(reference: breaching/cases/models/losses.py:7-66 and the CrossEntropy pick in
model_preparation.py:30-36). Each loss also handles soft labels (2D float arrays),
which the joint-optimization (DLG) attack relies on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cross_entropy(logits, labels):
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    if labels.ndim == logits.ndim:  # soft labels
        return -jnp.sum(labels * logprobs, axis=-1).mean()
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    return -jnp.sum(onehot * logprobs, axis=-1).mean()


class CrossEntropyLoss:
    """Mean cross entropy over the batch; supports hard int labels and soft labels."""

    name = "CrossEntropy"

    def __call__(self, outputs, labels):
        return _cross_entropy(outputs, labels)

    def __repr__(self):
        return "CrossEntropyLoss()"


class CausalLoss:
    """Shift-by-one causal LM loss (reference: losses.py CausalLoss).

    outputs: [B, T, V] logits; labels: [B, T] token ids. The prediction at
    position t is scored against the token at position t+1.
    """

    name = "CausalLoss"

    def __call__(self, outputs, labels):
        shift_logits = outputs[:, :-1, :]
        if labels.ndim == outputs.ndim:  # soft labels [B, T, V]
            shift_labels = labels[:, 1:, :]
            return _cross_entropy(
                shift_logits.reshape(-1, shift_logits.shape[-1]),
                shift_labels.reshape(-1, shift_labels.shape[-1]),
            )
        shift_labels = labels[:, 1:]
        return _cross_entropy(
            shift_logits.reshape(-1, shift_logits.shape[-1]), shift_labels.reshape(-1)
        )

    def __repr__(self):
        return "CausalLoss()"


class MLMLoss:
    """Masked-LM loss: cross entropy on all positions; masked positions carry the
    original token id, the rest are -100 and ignored (HF convention)."""

    name = "MLMLoss"

    def __call__(self, outputs, labels):
        logits = outputs.reshape(-1, outputs.shape[-1])
        if labels.ndim == outputs.ndim:  # soft labels [B, T, V] (joint-optimization)
            # no ignore positions in the relaxed case — same semantics torch's
            # CrossEntropyLoss adopts for class-probability targets
            return _cross_entropy(logits, labels.reshape(-1, labels.shape[-1]))
        flat_labels = labels.reshape(-1)
        mask = flat_labels != -100
        safe_labels = jnp.where(mask, flat_labels, 0)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logprobs, safe_labels[:, None], axis=-1)[:, 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

    def __repr__(self):
        return "MLMLoss()"


class MostlyCausalLoss(CausalLoss):
    """Causal loss that also scores position 0 against itself with a small weight,
    which strengthens first-token recovery (reference: losses.py MostlyCausalLoss)."""

    name = "MostlyCausalLoss"

    def __call__(self, outputs, labels):
        base = super().__call__(outputs, labels)
        if labels.ndim == outputs.ndim:
            first = _cross_entropy(outputs[:, 0, :], labels[:, 0, :])
        else:
            first = _cross_entropy(outputs[:, 0, :], labels[:, 0])
        return base + 0.5 * first


LOSSES = {
    "CrossEntropy": CrossEntropyLoss,
    "classification": CrossEntropyLoss,
    "causal-lm": CausalLoss,
    "masked-lm": MLMLoss,
    "mostly-causal-lm": MostlyCausalLoss,
}
