"""Sharded multi-user aggregation: simulated users distributed over a mesh.

The reference simulates its "industry-scale" secure-aggregation silo by looping
users sequentially in one process with per-user CPU staging (reference:
breaching/cases/users.py:462-533, SURVEY §2.9). TPU-natively, user batches shard
over the mesh's 'restarts' axis, each device computes its users' gradients, and
the secure-aggregation mean is ONE `jax.lax.pmean` over ICI — the whole fleet
update is a single compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # stable since jax 0.4.35; the experimental alias emits DeprecationWarning
    from jax import shard_map
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map


def sharded_user_aggregate(model, loss_fn, mesh, user_inputs, user_labels,
                           axis: str = "restarts"):
    """Average user gradients across a mesh axis.

    user_inputs: [num_users, B, ...] (num_users divisible by mesh axis size),
    user_labels: [num_users, B]. Returns the aggregated gradient pytree, exactly
    equal to the sequential running mean the in-process MultiUserAggregate
    computes.
    """
    params, buffers = model.params, model.buffers

    def per_shard(inputs_shard, labels_shard):
        # mark the replicated params as device-varying before differentiating:
        # under jax's varying-manual-axes semantics, the cotangent of an
        # INVARIANT closure constant is implicitly psum'd across the mesh,
        # which would double-count with the explicit pmean below
        local_params = jax.tree_util.tree_map(
            lambda p: jax.lax.pvary(p, (axis,)), params)

        def one_user(x, y):
            def task(p):
                out, _ = model.apply(p, buffers, x, train=False)
                return loss_fn(out, y)

            return jax.grad(task)(local_params)

        grads = jax.vmap(one_user)(inputs_shard, labels_shard)
        local_mean = jax.tree_util.tree_map(lambda g: jnp.mean(g, axis=0), grads)
        # secure-aggregation mean over ICI:
        return jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), local_mean)

    spec = P(axis)
    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=jax.tree_util.tree_map(lambda _: P(), params))
    return jax.jit(fn)(user_inputs, user_labels)
