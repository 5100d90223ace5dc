"""Cross-framework double-backward parity: torch autograd vs the JAX objectives.

The core quantity of the whole framework is the attack gradient
``grad_x distance(grad_theta L(theta, x, y), g*)`` — a gradient *through* a
gradient. The reference computes it with ``torch.autograd.grad(...,
create_graph=True)`` (reference breaching/attacks/auxiliaries/objectives.py:
40-46); this repo computes it by differentiating through ``jax.grad`` of the
task loss. These tests build the SAME randomly-initialized network in both
frameworks (weights moved torch->flax through the production converter /
explicit layout transposes), compute the attack gradient on both sides with
float64-free f32 math, and assert elementwise agreement — including through a
BatchNorm network in train mode and through the fedAVG multi-step unroll
(reference objectives.py:48-72).
"""

import os
import sys
from dataclasses import dataclass
from typing import Any

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402

from breaching_tpu.attacks.auxiliaries.objectives import (  # noqa: E402
    CosineSimilarity,
    Euclidean,
)
from breaching_tpu.cases.models.losses import CrossEntropyLoss  # noqa: E402
from convert_checkpoint import convert_resnet  # noqa: E402
from breaching_tpu.cases.models.model_preparation import load_flat_state  # noqa: E402
from test_convert_checkpoint import _TorchTinyResNet, _randomize_bn_stats  # noqa: E402


@dataclass
class _Model:
    """Minimal stand-in for model_preparation.JaxModel.apply's contract."""

    module: Any
    params: dict
    buffers: dict

    def apply(self, params, buffers, inputs, train=False, capture=False):
        variables = {"params": params}
        if buffers:
            variables["batch_stats"] = buffers
        if train and buffers:
            outputs, updated = self.module.apply(
                variables, inputs, train=train, mutable=["batch_stats"])
            return outputs, dict(updated)
        return self.module.apply(variables, inputs, train=train), {}


class _PlainConvNet(nn.Module):
    """BN-free conv net (global mean pool dodges flatten-layout questions)."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(nn.Conv(8, (3, 3), padding=1, name="conv0")(x))
        x = nn.relu(nn.Conv(16, (3, 3), strides=(2, 2), padding=1, name="conv1")(x))
        x = x.mean(axis=(1, 2))
        return nn.Dense(10, name="head")(x)


class _TorchPlainConvNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = tnn.Conv2d(3, 8, 3, 1, 1)
        self.conv1 = tnn.Conv2d(8, 16, 3, 2, 1)
        self.head = tnn.Linear(16, 10)

    def forward(self, x):
        x = torch.relu(self.conv0(x))
        x = torch.relu(self.conv1(x))
        return self.head(x.mean(dim=(2, 3)))


def _plain_pair(seed=0):
    """Matched (torch model, jax _Model) pair with identical random weights."""
    gen = torch.Generator().manual_seed(seed)
    tm = _TorchPlainConvNet()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)
    tm.eval()

    def t2j_conv(w):  # OIHW -> HWIO
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))

    params = {
        "conv0": {"kernel": t2j_conv(tm.conv0.weight), "bias": jnp.asarray(tm.conv0.bias.detach().numpy())},
        "conv1": {"kernel": t2j_conv(tm.conv1.weight), "bias": jnp.asarray(tm.conv1.bias.detach().numpy())},
        "head": {"kernel": jnp.asarray(tm.head.weight.detach().numpy().T),
                 "bias": jnp.asarray(tm.head.bias.detach().numpy())},
    }
    return tm, _Model(module=_PlainConvNet(), params=params, buffers={})


def _resnet_pair(seed=0):
    """Tiny BN ResNet in both frameworks, moved through the production converter."""
    from breaching_tpu.cases.models.resnets import ResNet

    gen = torch.Generator().manual_seed(seed)
    tm = _TorchTinyResNet()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        _randomize_bn_stats(tm, gen)
    tm.eval()

    flat = convert_resnet({k: v.numpy() for k, v in tm.state_dict().items()})
    module = ResNet(block="basic", layers=(1, 1), num_classes=10, stem="ImageNet",
                    width=8, strides=(1, 2))
    x0 = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x0, train=False)
    jm = _Model(module=module, params=variables["params"],
                buffers=variables.get("batch_stats", {}))
    load_flat_state(jm, flat, strict=True)
    return tm, jm


def _torch_task_grads(tm, x_t, y_t, create_graph=False):
    params = [p for p in tm.parameters()]
    loss = tnn.CrossEntropyLoss()(tm(x_t), y_t)
    return params, torch.autograd.grad(loss, params, create_graph=create_graph), loss


def _torch_attack_grad(tm, x_np, y_np, target_grads, distance, bn_train=False):
    """Reference semantics: autograd through create_graph=True double backward
    (reference objectives.py:40-46 + CosineSimilarity/Euclidean definitions)."""
    tm.train() if bn_train else tm.eval()
    x_t = torch.tensor(x_np.transpose(0, 3, 1, 2), requires_grad=True)
    y_t = torch.tensor(y_np)
    _, grads, _ = _torch_task_grads(tm, x_t, y_t, create_graph=True)
    targets = [torch.tensor(t) for t in target_grads]
    if distance == "cosine":
        product = sum((g * t).sum() for g, t in zip(grads, targets))
        rec = sum((g * g).sum() for g, t in zip(grads, targets))
        dat = sum((t * t).sum() for t in targets)
        objective = 1.0 - product / (rec.sqrt() * dat.sqrt() + 1e-12)
    else:
        objective = 0.5 * sum(((g - t) ** 2).sum() for g, t in zip(grads, targets))
    objective.backward()
    tm.eval()
    return float(objective.detach()), x_t.grad.numpy().transpose(0, 2, 3, 1)


def _jax_attack_grad(jm, x_np, y_np, objective_cls, bn_train=False,
                     local_hyperparams=None, target_override=None):
    objective = objective_cls(scale=1.0)
    objective.initialize(CrossEntropyLoss(), jm, local_hyperparams=local_hyperparams)
    labels = jnp.asarray(y_np)
    target = target_override
    if target is None:
        target, _, _ = objective.grad_fn(jm.params, jm.buffers, jnp.asarray(x_np),
                                         labels, bn_train=bn_train)

    def attack_loss(candidate):
        value, _, _ = objective(jm.params, jm.buffers, target, candidate, labels,
                                bn_train=bn_train)
        return value

    value, gx = jax.value_and_grad(attack_loss)(jnp.asarray(x_np))
    return float(value), np.asarray(gx), target


def _flatten_torch(grads):
    return np.concatenate([g.detach().numpy().ravel() for g in grads])


def _flatten_jax(tree):
    return np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(tree)])


def _data(batch=2, size=12, seed=3):
    rs = np.random.RandomState(seed)
    x = rs.randn(batch, size, size, 3).astype(np.float32) * 0.5
    y = rs.randint(0, 10, size=batch).astype(np.int64)
    return x, y


def test_first_order_task_gradients_match():
    """Sanity floor: grad_theta L agrees before any double backward."""
    tm, jm = _plain_pair()
    x, y = _data()
    _, tg, tloss = _torch_task_grads(
        tm, torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(y))
    obj = Euclidean(scale=1.0)
    obj.initialize(CrossEntropyLoss(), jm)
    jg, jloss, _ = obj.grad_fn(jm.params, jm.buffers, jnp.asarray(x), jnp.asarray(y))
    assert abs(float(tloss) - float(jloss)) < 1e-5
    t_flat, j_flat = _flatten_torch(tg), _flatten_jax(jg)
    assert np.allclose(np.linalg.norm(t_flat), np.linalg.norm(j_flat), rtol=1e-5)
    # order-free comparison (leaf orders differ): global norm + global dot
    assert np.isclose(float(np.dot(t_flat, t_flat)), float(np.dot(j_flat, j_flat)), rtol=1e-5)


@pytest.mark.parametrize("distance,objective_cls",
                         [("cosine", CosineSimilarity), ("euclidean", Euclidean)])
def test_double_backward_plain_convnet(distance, objective_cls):
    tm, jm = _plain_pair()
    x, y = _data()
    x_true, y_true = _data(seed=11)

    # target gradient computed independently on each side from the true data
    params, tgrads, _ = _torch_task_grads(
        tm, torch.tensor(x_true.transpose(0, 3, 1, 2)), torch.tensor(y_true))
    t_targets = [g.detach().numpy() for g in tgrads]

    t_val, t_gx = _torch_attack_grad(tm, x, y, t_targets, distance)
    # the JAX target from the same true data, via the production grad_fn
    obj = objective_cls(scale=1.0)
    obj.initialize(CrossEntropyLoss(), jm)
    j_target, _, _ = obj.grad_fn(jm.params, jm.buffers, jnp.asarray(x_true),
                                 jnp.asarray(y_true))
    j_val, j_gx, _ = _jax_attack_grad(jm, x, y, objective_cls,
                                      target_override=j_target)

    assert abs(t_val - j_val) < 1e-5
    np.testing.assert_allclose(j_gx, t_gx, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("bn_train", [False, True])
def test_double_backward_batchnorm_resnet(bn_train):
    """The converter-matched BN ResNet: eval (running stats) and train
    (batch stats) modes — the hard case for hook-free BN parity."""
    tm, jm = _resnet_pair()
    x, y = _data(batch=2, size=16, seed=5)
    x_true, y_true = _data(batch=2, size=16, seed=17)

    tm.train() if bn_train else tm.eval()
    # freeze running-stat updates so the target pass doesn't mutate state
    saved = {k: v.clone() for k, v in tm.state_dict().items()}
    _, tgrads, _ = _torch_task_grads(
        tm, torch.tensor(x_true.transpose(0, 3, 1, 2)), torch.tensor(y_true))
    t_targets = [g.detach().numpy() for g in tgrads]
    tm.load_state_dict(saved)

    obj = CosineSimilarity(scale=1.0)
    obj.initialize(CrossEntropyLoss(), jm)
    j_target, _, _ = obj.grad_fn(jm.params, jm.buffers, jnp.asarray(x_true),
                                 jnp.asarray(y_true), bn_train=bn_train)

    t_val, t_gx = _torch_attack_grad(tm, x, y, t_targets, "cosine", bn_train=bn_train)
    tm.load_state_dict(saved)
    j_val, j_gx, _ = _jax_attack_grad(jm, x, y, CosineSimilarity, bn_train=bn_train,
                                      target_override=j_target)

    assert abs(t_val - j_val) < 1e-5
    np.testing.assert_allclose(j_gx, t_gx, rtol=1e-4, atol=1e-6)


def test_double_backward_fedavg_unroll():
    """Multi-step (fedAVG) parameter-delta matching: the JAX lax.scan unroll
    (objectives.py grad_fn multi-step) vs a hand-unrolled torch SGD with
    create_graph=True through torch.func.functional_call
    (reference objectives.py:48-72 _grad_fn_multi_step)."""
    tm, jm = _plain_pair(seed=2)
    steps, data_per_step, lr = 3, 2, 0.05
    x, y = _data(batch=4, seed=7)
    x_true, y_true = _data(batch=4, seed=23)
    idx = (np.arange(steps * data_per_step) % x.shape[0]).reshape(steps, data_per_step)
    step_labels_true = y_true[idx % x_true.shape[0]]
    step_labels = y[idx]

    def torch_delta(x_np, labels_per_step, create_graph):
        names = [n for n, _ in tm.named_parameters()]
        p0 = {n: p.detach().clone().requires_grad_(True)
              for n, p in tm.named_parameters()}
        cur = dict(p0)
        x_t = torch.tensor(x_np.transpose(0, 3, 1, 2), requires_grad=create_graph)
        for s in range(steps):
            batch = x_t[torch.tensor(idx[s])]
            lab = torch.tensor(labels_per_step[s])
            loss = tnn.CrossEntropyLoss()(
                torch.func.functional_call(tm, cur, (batch,)), lab)
            grads = torch.autograd.grad(loss, list(cur.values()), create_graph=create_graph)
            cur = {n: cur[n] - lr * g for n, g in zip(names, grads)}
        return x_t, [cur[n] - p0[n] for n in names]

    _, t_target = torch_delta(x_true, step_labels_true, create_graph=False)
    t_targets = [d.detach().numpy() for d in t_target]

    x_t, t_delta = torch_delta(x, step_labels, create_graph=True)
    objective = 0.5 * sum(((d - torch.tensor(t)) ** 2).sum()
                          for d, t in zip(t_delta, t_targets))
    objective.backward()
    t_val, t_gx = float(objective.detach()), x_t.grad.numpy().transpose(0, 2, 3, 1)

    local = dict(lr=lr, steps=steps, data_per_step=data_per_step,
                 labels=jnp.asarray(step_labels))
    obj = Euclidean(scale=1.0)
    obj.initialize(CrossEntropyLoss(), jm, local_hyperparams=dict(
        lr=lr, steps=steps, data_per_step=data_per_step,
        labels=jnp.asarray(step_labels_true)))
    j_target, _, _ = obj.grad_fn(jm.params, jm.buffers, jnp.asarray(x_true),
                                 jnp.asarray(y_true))
    j_val, j_gx, _ = _jax_attack_grad(jm, x, y, Euclidean,
                                      local_hyperparams=local,
                                      target_override=j_target)

    assert abs(t_val - j_val) < 1e-5
    np.testing.assert_allclose(j_gx, t_gx, rtol=1e-4, atol=1e-6)
