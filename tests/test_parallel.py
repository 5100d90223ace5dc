"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


requires_multidevice = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


@requires_multidevice
def test_make_mesh_factorization():
    from breaching_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    assert mesh.shape["restarts"] * mesh.shape["model"] == 8
    assert mesh.shape["model"] == 2  # largest divisor <= sqrt(8)


@requires_multidevice
def test_dryrun_multichip_entrypoint():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


@requires_multidevice
def test_sharded_user_aggregate_matches_sequential():
    """pmean over the mesh must equal the sequential per-user running mean."""
    import jax.numpy as jnp

    from breaching_tpu.cases.models import construct_model
    from breaching_tpu.config.loader import ConfigNode
    from breaching_tpu.parallel import make_mesh, sharded_user_aggregate

    cfg_data = ConfigNode(
        name="CIFAR10", modality="vision", task="classification", classes=10,
        shape=[3, 8, 8], normalize=True, mean=[0.5] * 3, std=[0.25] * 3,
        path="~/x", size=100, examples_from_split="validation",
        partition="none", default_clients=1, batch_size=4, caching=False)
    model, loss_fn = construct_model("ConvNetSmall16", cfg_data, key=jax.random.PRNGKey(0))
    num_users, B = 8, 2
    inputs = jax.random.normal(jax.random.PRNGKey(1), (num_users, B, 8, 8, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (num_users, B), 0, 10)

    mesh = make_mesh(8)
    agg = sharded_user_aggregate(model, loss_fn, mesh, inputs, labels)

    def seq_grad(x, y):
        def task(p):
            out, _ = model.apply(p, {}, x, train=False)
            return loss_fn(out, y)
        return jax.grad(task)(model.params)

    seq = None
    for u in range(num_users):
        g = seq_grad(inputs[u], labels[u])
        seq = g if seq is None else jax.tree_util.tree_map(lambda a, b: a + b, seq, g)
    seq = jax.tree_util.tree_map(lambda a: a / num_users, seq)

    for a, b in zip(jax.tree_util.tree_leaves(agg), jax.tree_util.tree_leaves(seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


@requires_multidevice
def test_sharded_attack_step_runs():
    """The explicitly-sharded attack step compiles and advances candidates."""
    import jax.numpy as jnp

    from breaching_tpu.attacks.auxiliaries.objectives import Euclidean
    from breaching_tpu.cases.models import construct_model
    from breaching_tpu.config.loader import ConfigNode
    from breaching_tpu.parallel import make_mesh, sharded_attack_step, shard_pytree
    from breaching_tpu.parallel.mesh import params_partition_specs
    import optax

    cfg_data = ConfigNode(
        name="CIFAR10", modality="vision", task="classification", classes=10,
        shape=[3, 8, 8], normalize=True, mean=[0.5] * 3, std=[0.25] * 3,
        path="~/x", size=100, examples_from_split="validation",
        partition="none", default_clients=1, batch_size=4, caching=False)
    model, loss_fn = construct_model("ConvNetSmall16", cfg_data, key=jax.random.PRNGKey(0))
    x_true = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    labels = jnp.asarray([0, 1])

    def task(p, x):
        out, _ = model.apply(p, {}, x, train=False)
        return loss_fn(out, labels)

    target = jax.grad(task)(model.params, x_true)
    objective = Euclidean(scale=1.0)
    objective.initialize(loss_fn, model, None, None)

    mesh = make_mesh(8)
    opt = optax.adam(0.1)
    step_fn, specs = sharded_attack_step(model, loss_fn, objective, mesh,
                                         model.params, optimizer=opt)
    params = shard_pytree(model.params, mesh, specs)
    target = shard_pytree(target, mesh, specs)
    candidates = jax.random.normal(jax.random.PRNGKey(2), (8, 2, 8, 8, 3))
    opt_state = jax.vmap(opt.init)(candidates)
    new_c, new_s, vals = step_fn(candidates, opt_state, params, {}, target, labels)
    assert new_c.shape == candidates.shape
    assert np.isfinite(np.asarray(vals)).all()


@requires_multidevice
def test_sharded_matches_single_device():
    """The sharded attack step must produce the same values as unsharded."""
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from breaching_tpu.attacks.auxiliaries.objectives import Euclidean
    from breaching_tpu.cases.models import construct_model
    from breaching_tpu.config.loader import ConfigNode
    from breaching_tpu.parallel import make_mesh, params_partition_specs, shard_pytree

    cfg_data = ConfigNode(
        name="CIFAR10", modality="vision", task="classification", classes=10,
        shape=[3, 16, 16], normalize=True, mean=[0.5] * 3, std=[0.25] * 3,
        path="~/x", size=100, examples_from_split="validation",
        partition="none", default_clients=1, batch_size=4, caching=False)
    model, loss_fn = construct_model("ConvNetSmall16", cfg_data, key=jax.random.PRNGKey(0))
    x_true = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    labels = jnp.asarray([0, 1])

    def task(p, x):
        out, _ = model.apply(p, {}, x, train=False)
        return loss_fn(out, labels)

    target = jax.grad(task)(model.params, x_true)
    objective = Euclidean(scale=1.0)
    objective.initialize(loss_fn, model, None, None)

    def matching(c, params, target):
        obj, _, _ = objective(params, {}, target, c, labels)
        return obj

    candidate = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    plain = jax.jit(jax.grad(matching))(candidate, model.params, target)

    mesh = make_mesh(8)
    specs = params_partition_specs(model.params, mesh)
    params_sharded = shard_pytree(model.params, mesh, specs)
    target_sharded = shard_pytree(target, mesh, specs)
    sharded = jax.jit(jax.grad(matching))(candidate, params_sharded, target_sharded)

    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded), rtol=2e-4, atol=1e-6)


@requires_multidevice
def test_batch_sharding_guards_unsupported_combos():
    """attack.impl.sharding='batch' must refuse settings whose semantics it
    cannot reproduce (L-BFGS pytree inner products span the full candidate)."""
    import breaching_tpu as breaching

    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "attack.optim.optimizer=L-BFGS",  # closure optimizer
        "case.model=ConvNetSmall16", "case.data.shape=[3,16,16]",
        "case.user.num_data_points=2", "case.data.batch_size=2",
        "case.user.provide_labels=True",
        "attack.optim.max_iterations=2", "attack.optim.callback=1",
        "seed=4",
    ])
    cfg.attack.impl.sharding = "batch"
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    shared, payloads, _ = server.run_protocol(user)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    with pytest.raises(ValueError, match="cannot shard this attack"):
        attacker.reconstruct(payloads, shared, server.secrets)


@requires_multidevice
def test_batch_sharding_indivisible_batch_raises():
    import breaching_tpu as breaching

    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3,16,16]",
        "case.user.num_data_points=1", "case.user.provide_labels=True",
        "attack.optim.max_iterations=2", "attack.optim.callback=1",
        "attack.restarts.num_trials=4", "seed=4",
    ])
    cfg.attack.impl.sharding = "batch"  # 8 devices, 4 trials -> model axis 2; B=1
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    shared, payloads, _ = server.run_protocol(user)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    with pytest.raises(ValueError, match="not divisible"):
        attacker.reconstruct(payloads, shared, server.secrets)
