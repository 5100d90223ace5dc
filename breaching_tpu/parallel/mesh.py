"""Multi-chip scaling: mesh construction and sharded attack steps.

The reference framework is strictly single-process/single-device
(reference: breaching/utils.py:23-53, SURVEY.md §2.9). The TPU-native scaling
story replaces that with SPMD over a `jax.sharding.Mesh`:

- axis 'restarts' (data-parallel-like): independent attack trials / benchmark
  users advance in lockstep, one shard of the candidate batch per device slice.
- axis 'model' (tensor-parallel-like): wide layers' channel dimensions are
  sharded; XLA inserts the psum/all-gather collectives over ICI for the
  gradient-matching reductions automatically.

Everything is plain `jax.jit` with `NamedSharding` constraints — no manual
collectives. On one chip the same code runs with a trivial 1x1 mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names=("restarts", "model")):
    """Build a 2D mesh over the first n devices, factorizing n as (n/k, k) with
    the largest k <= sqrt(n) that divides n."""
    devices = jax.devices()[: n_devices or jax.device_count()]
    n = len(devices)
    k = 1
    for cand in range(1, int(np.sqrt(n)) + 1):
        if n % cand == 0:
            k = cand
    shape = (n // k, k)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def make_attack_mesh(num_trials: int, mode: str = "restarts", n_devices: int | None = None):
    """Mesh for the PRODUCTION attack chunk runner (attack.impl.sharding).

    The restarts axis takes the largest device count that divides num_trials
    (trials shard evenly); with mode "2d"/"model" the leftover devices become a
    'model' axis for megatron-style channel sharding of params/target grads.
    Always 2D (model axis may be size 1) so partition specs are uniform.
    """
    n = n_devices or jax.device_count()
    rest = next(d for d in range(n, 0, -1) if n % d == 0 and num_trials % d == 0)
    model = n // rest if mode in ("2d", "model") else 1
    devices = np.asarray(jax.devices()[: rest * model]).reshape(rest, model)
    return Mesh(devices, ("restarts", "model"))


def params_partition_specs(params, mesh, axis: str = "model"):
    """Channel-shard every parameter whose last dim divides the mesh axis size.

    This is the simple megatron-style rule for conv/dense kernels (out-channel
    sharding); biases and norm scales follow their feature dimension.
    """
    size = mesh.shape[axis]

    def spec_for(leaf):
        if leaf.ndim >= 1 and leaf.shape[-1] % size == 0 and leaf.shape[-1] >= size:
            return P(*([None] * (leaf.ndim - 1)), axis)
        return P()

    return jax.tree_util.tree_map(spec_for, params)


def shard_pytree(tree, mesh, specs):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def sharded_attack_step(model, loss_fn, objective, mesh, params, optimizer=None):
    """Build one fully-sharded gradient-inversion step, jitted with explicit
    shardings: candidates [restarts, B, H, W, C] over the 'restarts' axis,
    parameters channel-sharded over 'model'. XLA lowers the matching objective's
    pytree reductions to psums over the 'model' axis of ICI.

    Returns (step_fn, param_specs); step_fn(candidates, opt_state, params,
    buffers, target_grads, labels) -> (candidates, opt_state, values).
    """
    optimizer = optimizer or optax.adam(0.1)

    def single_trial_loss(candidate, params, buffers, target_grads, labels):
        obj, _, _ = objective(params, buffers, target_grads, candidate, labels,
                              bn_train=False, capture=False)
        return obj

    def step(candidates, opt_state, params, buffers, target_grads, labels):
        def per_trial(candidate, ostate):
            val, grad = jax.value_and_grad(single_trial_loss)(
                candidate, params, buffers, target_grads, labels)
            updates, ostate = optimizer.update(grad, ostate, candidate)
            return optax.apply_updates(candidate, updates), ostate, val

        return jax.vmap(per_trial, in_axes=(0, 0))(candidates, opt_state)

    param_specs = params_partition_specs(params, mesh)
    cand_sharding = NamedSharding(mesh, P("restarts"))
    jitted = jax.jit(
        step,
        in_shardings=(
            cand_sharding,
            None,  # opt state sharding inferred from candidates
            jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), param_specs),
            None, None, None,
        ),
        out_shardings=(cand_sharding, None, None),
    )
    return jitted, param_specs
