"""Model zoo tests: shapes, init statistics, BatchNorm semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from breaching_tpu.cases.models import construct_model
from breaching_tpu.config.loader import ConfigNode


def _data_cfg(name="CIFAR10", classes=10, shape=(3, 32, 32)):
    return ConfigNode(
        name=name, modality="vision", task="classification", classes=classes,
        shape=list(shape), normalize=True, mean=[0.5] * 3, std=[0.25] * 3,
        path="~/nonexistent", size=50_000, examples_from_split="validation",
        partition="balanced", default_clients=10, batch_size=32, caching=False)


@pytest.mark.parametrize("name,expected_buffers", [
    ("ConvNet", True), ("ConvNetSmall", False), ("lenet_zhu", False),
    ("MLP", False), ("linear", False), ("cnn6", False), ("resnet20", True),
    ("densenet121", True), ("VGG11", True), ("nfnet_f0", False),
    ("convnet_beyond", False), ("convnet-trivial", False), ("resnetgn20", False),
])
def test_forward_shapes(name, expected_buffers):
    model, loss_fn = construct_model(name, _data_cfg(), key=jax.random.PRNGKey(0))
    x = jnp.ones((2, 32, 32, 3))
    out, aux = model.apply(model.params, model.buffers, x, train=False)
    assert out.shape == (2, 10)
    assert model.has_batchnorm == expected_buffers
    loss = loss_fn(out, jnp.asarray([1, 2]))
    assert np.isfinite(float(loss))


def test_head_grads_orientation():
    model, loss_fn = construct_model("linear", _data_cfg(), key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    y = jnp.asarray([3])

    def loss(p):
        out, _ = model.apply(p, {}, x, train=False)
        return loss_fn(out, y)

    grads = jax.grad(loss)(model.params)
    w_grad, b_grad = model.head_grads(grads)
    assert w_grad.shape == (10, 32 * 32 * 3)
    assert b_grad.shape == (10,)
    # iDLG property: only the true label's bias gradient is negative.
    assert int(jnp.argmin(b_grad)) == 3
    assert float(b_grad[3]) < 0
    # FC inversion: weight_grad row / bias_grad recovers the input exactly.
    rec = w_grad[3] / b_grad[3]
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x).reshape(-1), rtol=1e-4)


def test_batchnorm_single_step_shares_batch_stats():
    """With cumulative running stats, one train-mode step shares exactly the
    batch statistics (reference users.py:140-143 momentum=None semantics)."""
    model, _ = construct_model("ConvNet", _data_cfg(), key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    _, aux = model.apply(model.params, model.buffers, x, train=True)
    new_buffers = aux["batch_stats"]
    # Recompute the first BN layer's input stats by hand: it sees conv0(x).
    first_conv_params = {"conv0": model.params["conv0"]}

    import flax.linen as nn
    from breaching_tpu.cases.models.layers import Conv

    conv_out = Conv(64, name="conv0").apply({"params": model.params["conv0"]}, x)
    expected_mean = np.asarray(conv_out.mean(axis=(0, 1, 2)))
    got_mean = np.asarray(new_buffers["bn0"]["mean"])
    np.testing.assert_allclose(got_mean, expected_mean, atol=1e-5)


def test_torch_style_init_statistics():
    model, _ = construct_model("ConvNet", _data_cfg(), key=jax.random.PRNGKey(0))
    kernel = np.asarray(model.params["conv1"]["conv"]["kernel"])  # (3,3,64,128)
    fan_in = 3 * 3 * 64
    bound = 1.0 / np.sqrt(fan_in)
    assert np.abs(kernel).max() <= bound + 1e-6
    assert kernel.std() > bound / 4  # roughly uniform, not collapsed


def test_nfnet_f0_structure():
    """Full-F0 fidelity (reference nfnets.py:229-309): four-conv bottleneck with
    grouped 3x3s (group size 128), per-block zero-init skip_gain, 2x final conv."""
    from breaching_tpu.cases.models.nfnets import NFNet

    model = NFNet(num_classes=10, stem="CIFAR")
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.ones((1, 32, 32, 3)), train=False),
        jax.random.PRNGKey(0))
    p = shapes["params"]
    # stage2 width 1536 -> bottleneck 768, groups 768//128=6 -> in/groups = 128
    assert p["stage2_block0"]["conv1"]["kernel"].shape == (3, 3, 128, 768)
    assert "conv1b" in p["stage2_block0"]
    assert p["stage0_block0"]["skip_gain"].shape == ()
    assert p["final_conv"]["kernel"].shape == (1, 1, 1536, 3072)
    n_params = sum(np.prod(leaf.shape) for leaf in jax.tree.leaves(p))
    assert 6.0e7 < n_params < 8.5e7  # official F0 ~71.5M
