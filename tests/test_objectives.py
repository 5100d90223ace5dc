"""Objective-function tests against hand-computed values."""

import jax
import jax.numpy as jnp
import numpy as np

from breaching_tpu.attacks.auxiliaries.objectives import (
    CosineSimilarity,
    Euclidean,
    FastCosineSimilarity,
    L1Loss,
    MaskedCosineSimilarity,
    PearlmutterCosine,
    PearlmutterEuclidean,
    objective_lookup,
)

A = {"layer": {"kernel": jnp.asarray([[1.0, 2.0], [3.0, 4.0]]), "bias": jnp.asarray([1.0, -1.0])}}
B = {"layer": {"kernel": jnp.asarray([[0.0, 2.0], [3.0, 0.0]]), "bias": jnp.asarray([0.0, 0.0])}}


def test_euclidean_value():
    # residual: kernel [[1,0],[0,4]], bias [1,-1] -> 0.5 * (1+16+1+1) = 9.5
    val = Euclidean().gradient_based_loss(A, B)
    assert np.isclose(float(val), 9.5)


def test_l1_value():
    # 0.5 * (1+0+0+4 + 1+1) = 3.5
    val = L1Loss().gradient_based_loss(A, B)
    assert np.isclose(float(val), 3.5)


def test_cosine_value():
    dot = 4.0 + 9.0
    na = np.sqrt(1 + 4 + 9 + 16 + 1 + 1)
    nb = np.sqrt(4 + 9)
    expected = 1 - dot / (na * nb)
    val = CosineSimilarity().gradient_based_loss(A, B)
    assert np.isclose(float(val), expected, rtol=1e-5)


def test_masked_cosine_masks_zero_positions():
    val = MaskedCosineSimilarity().gradient_based_loss(A, B)
    # mask keeps kernel[0,1] and kernel[1,0] only: dot=4+9, norms equal -> cos=1
    assert np.isclose(float(val), 0.0, atol=1e-6)


def test_identical_gradients_are_optimal():
    for name, cls in objective_lookup.items():
        val = cls().gradient_based_loss(A, A)
        if name in ("euclidean", "l1", "tag-euclidean", "pearlmutter-loss"):
            assert np.isclose(float(val), 0.0, atol=1e-5), name
        elif "cosine" in name or name == "angular":
            assert float(val) < 1e-3, name


def test_pearlmutter_euclidean_gradient_matches_exact():
    """The 'pearlmutter' objective must produce the same candidate gradient as the
    exact euclidean objective (it replaces finite differences with exact HVPs)."""

    def g_of_x(x):  # a toy "gradient" as a function of candidate x
        return {"w": jnp.asarray([x[0] ** 2, x[1] * x[0]]), "b": jnp.sin(x)}

    target = {"w": jnp.asarray([0.3, -0.2]), "b": jnp.asarray([0.1, 0.4])}
    x0 = jnp.asarray([0.7, -1.3])

    exact = jax.grad(lambda x: float(0) + Euclidean().gradient_based_loss(g_of_x(x), target))(x0)
    pearl = jax.grad(lambda x: PearlmutterEuclidean().gradient_based_loss(g_of_x(x), target))(x0)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(pearl), rtol=1e-5)


def test_pearlmutter_cosine_gradient_matches_exact():
    """The reference's PearlmutterCosine first-order direction is the exact cosine
    derivative (objectives.py:471-479), so its candidate gradient must equal the
    full CosineSimilarity gradient."""

    def g_of_x(x):
        return {"w": jnp.asarray([x[0] ** 2, x[1] * x[0]]), "b": jnp.cos(x)}

    target = {"w": jnp.asarray([0.3, -0.2]), "b": jnp.asarray([0.1, 0.4])}
    x0 = jnp.asarray([0.7, -1.3])
    exact = jax.grad(lambda x: CosineSimilarity().gradient_based_loss(g_of_x(x), target))(x0)
    pearl = jax.grad(lambda x: PearlmutterCosine().gradient_based_loss(g_of_x(x), target))(x0)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(pearl), rtol=1e-4)


def test_grad_accum_matches_full_batch():
    """impl.grad_accum micro-batching (checkpointed scan) must reproduce the
    full-batch objective value and candidate gradient exactly (the user's mean
    gradient is a mean of equal micro-batch gradients)."""
    import jax

    import breaching_tpu as breaching
    from breaching_tpu.attacks.auxiliaries.objectives import CosineSimilarity

    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.user.num_data_points=8", "case.user.provide_labels=True", "seed=3",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    shared, payloads, true_data = server.run_protocol(user)
    grads = shared[0]["gradients"]
    labels = jnp.asarray(true_data["labels"])
    candidate = jnp.asarray(true_data["data"]) + 0.1

    def value_and_grad(impl):
        obj = CosineSimilarity(scale=1.0)
        obj.initialize(server.loss, server.model, None, impl)
        fn = lambda c: obj(server.model.params, server.model.buffers, grads,
                           c, labels)[0]
        return jax.value_and_grad(fn)(candidate)

    v_full, g_full = value_and_grad({"grad_accum": 1})
    v_acc, g_acc = value_and_grad({"grad_accum": 4})
    assert np.allclose(v_full, v_acc, rtol=1e-5), (v_full, v_acc)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_acc),
                               rtol=1e-4, atol=1e-6)
