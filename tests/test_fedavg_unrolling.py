"""Oracle: the attack's unrolled fedAVG simulation must reproduce the user's
parameter delta exactly when fed the true data (the matching loss at the truth
is ~0). This pins the lax.scan unrolling against the user's SGD loop.

Note: the leaked per-step labels are *sorted* (threat-model semantics shared
with the reference, users.py:367), so exactness only holds when sorting is a
no-op — here via a single-class partition."""

import jax
import jax.numpy as jnp
import numpy as np

import breaching_tpu as breaching
from breaching_tpu.attacks.auxiliaries.objectives import Euclidean


def test_unrolled_objective_zero_at_truth():
    cfg = breaching.get_config([
        "case=4_fedavg_small_scale", "attack=invertinggradients",
        "case/data=CIFAR10",  # fast sandbox; case 4 itself is now ResNet18/ImageNetAnimals
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.data.partition=unique-class", "case.user.user_idx=2",
        "case.user.num_data_points=4", "case.user.num_local_updates=3",
        "case.user.num_data_per_local_update_step=2",
        "case.user.local_learning_rate=0.1",
        "case.user.provide_labels=True", "case.user.provide_local_hyperparams=True",
        "seed=8",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    shared, payloads, true_data = server.run_protocol(user)

    local_hp = dict(shared[0]["metadata"]["local_hyperparams"])
    local_hp["labels"] = jnp.asarray(np.stack([np.asarray(l) for l in local_hp["labels"]]))

    objective = Euclidean(scale=1.0)
    objective.initialize(loss_fn, model, local_hp, cfg.attack.impl)
    delta_norm = float(sum(jnp.vdot(g, g) for g in
                           jax.tree_util.tree_leaves(shared[0]["gradients"])))

    value, task_loss, _ = objective(
        payloads[0]["parameters"], model.buffers, shared[0]["gradients"],
        jnp.asarray(true_data["data"]), jnp.asarray(true_data["labels"]))
    # relative mismatch of the simulated vs actual delta at the truth: ~f32 eps
    assert float(value) / max(delta_norm, 1e-12) < 1e-4, (float(value), delta_norm)

    # and a perturbed candidate must produce a much larger mismatch
    wrong = jnp.asarray(true_data["data"]) + 0.5
    value_wrong, _, _ = objective(
        payloads[0]["parameters"], model.buffers, shared[0]["gradients"],
        wrong, jnp.asarray(true_data["labels"]))
    assert float(value_wrong) > 100 * float(value), (float(value_wrong), float(value))
