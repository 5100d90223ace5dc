"""Pytree parameter utilities for model surgery.

Functional counterpart of reference
breaching/cases/malicious_modifications/parameter_utils.py (introspect_model
shape-probe hooks:6-29, replace_module_by_instance:32-40, path helpers:50-126).
Torch needs forward hooks and attribute-walking to find and replace modules; on
pytrees the same operations are path lookups, and shape introspection is
`jax.eval_shape` with sown intermediates — no hooks, no mutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fetch_path(tree, path):
    node = tree
    for key in path:
        node = node[key]
    return node


def set_path(tree, path, value):
    """Return a copy of `tree` with `value` at `path` (non-mutating)."""
    import copy

    out = copy.copy(tree)
    node = out
    for key in path[:-1]:
        node[key] = copy.copy(node[key])
        node = node[key]
    node[path[-1]] = value
    return out


def replace_subtree(params, path, new_subtree):
    """The pytree equivalent of replace_module_by_instance: swap the parameters
    of one submodule wholesale."""
    return set_path(params, path, new_subtree)


def introspect_model(model, input_shape, dtype=jnp.float32):
    """Shape map of every intermediate the model sows, plus output shape
    (reference probes shapes with forward hooks, parameter_utils.py:6-29)."""
    example = jnp.zeros((1, *input_shape), dtype)

    def fn(params, buffers):
        out, aux = model.apply(params, buffers, example, train=False, capture=True)
        return out, aux.get("intermediates", {})

    out_shape, inter_shapes = jax.eval_shape(fn, model.params, model.buffers)
    flat = jax.tree_util.tree_flatten_with_path(inter_shapes)[0]
    shapes = {
        "/".join(str(getattr(k, "key", k)) for k in path): tuple(leaf.shape)
        for path, leaf in flat
    }
    shapes["__output__"] = tuple(out_shape.shape)
    return shapes


def param_paths(tree, predicate=None):
    """All leaf paths (as tuples of keys), optionally filtered by predicate(path, leaf)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for path, leaf in flat:
        keys = tuple(str(getattr(k, "key", k)) for k in path)
        if predicate is None or predicate(keys, leaf):
            out.append(keys)
    return out
