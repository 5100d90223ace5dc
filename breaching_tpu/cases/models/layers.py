"""Shared flax building blocks for the breaching-tpu model zoo.

Design notes (TPU-first):
- All vision models are NHWC; convolutions hit the MXU directly in this layout.
- Initializers reproduce the *statistics* of torch defaults (kaiming-uniform with
  a=sqrt(5) for conv/linear weights, uniform fan-in bias) so that "untrained"
  attack difficulty is comparable to the reference (reference default modules in
  breaching/cases/models/model_preparation.py:408-513).
- Batch statistics are sown into the 'intermediates' collection, replacing the
  reference's forward hooks (breaching/attacks/auxiliaries/deepinversion.py:84-107)
  — JAX has no hooks, so regularizers consume explicit auxiliary outputs instead.
- Running stats use torch's `momentum=None` cumulative-average semantics
  (reference: breaching/cases/users.py:140-143), so a single user step shares
  exactly the batch statistics.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_kaiming_uniform(fan_in_axes=None):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — the statistics of torch's default
    kaiming_uniform_(a=sqrt(5)) for conv and linear weights."""

    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 2:  # dense kernel (in, out)
            fan_in = shape[0]
        else:  # conv kernel (kh, kw, in, out)
            receptive = 1
            for s in shape[:-2]:
                receptive *= s
            fan_in = shape[-2] * receptive
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_uniform(fan_in: int):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """Conv2d with torch-default init statistics, NHWC."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size[0] * self.kernel_size[1] // self.feature_group_count
        padding = self.padding
        if padding == "SAME" and all(k % 2 == 1 for k in self.kernel_size):
            # torch pads odd kernels symmetrically by k//2; XLA's SAME is the
            # same at stride 1 but pads asymmetrically at stride > 1 (e.g.
            # (2,3) for the 7x7/2 ImageNet stem where torch pads (3,3)).
            # Explicit symmetric padding keeps output shapes identical AND
            # makes forwards bit-compatible with converted torch checkpoints
            # (tools/convert_checkpoint.py).
            padding = tuple((k // 2, k // 2) for k in self.kernel_size)
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=padding,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=torch_kaiming_uniform(),
            bias_init=torch_bias_uniform(fan_in),
            name="conv",
        )(x)


class Dense(nn.Module):
    """Linear layer with torch-default init statistics."""

    features: int
    use_bias: bool = True
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_kaiming_uniform(),
            bias_init=torch_bias_uniform(fan_in),
            name="dense",
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with cumulative running statistics and sown batch stats.

    In train mode the layer normalizes with the current batch statistics, sows
    (mean, var) into 'intermediates' under 'bn_stats' for the DeepInversion
    regularizer, and (when 'batch_stats' is mutable) folds the batch statistics
    into the running average with cumulative weighting — matching torch BN with
    momentum=None, which the reference forces for users without public buffers
    (breaching/cases/users.py:140-143).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (features,))
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (features,))
        counter = self.variable(
            "batch_stats", "num_batches_tracked", lambda *a: jnp.zeros((), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.mean(jnp.square(x), axis=reduce_axes) - jnp.square(mean)
            self.sow("intermediates", "bn_stats", (mean, var))
            if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
                n = counter.value
                # Cumulative moving average (torch momentum=None): after the first
                # batch the running stats are exactly the batch stats.
                count = x.size // features
                unbiased_var = var * count / jnp.maximum(count - 1, 1)
                ra_mean.value = (ra_mean.value * n + mean) / (n + 1)
                ra_var.value = (ra_var.value * n + unbiased_var) / (n + 1)
                counter.value = n + 1

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class GroupNorm(nn.Module):
    num_groups: int = 32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):  # signature parity with BatchNorm
        return nn.GroupNorm(num_groups=min(self.num_groups, x.shape[-1]), name="gn")(x)


def max_pool(x, window: int, stride: int | None = None, padding="VALID"):
    stride = stride or window
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=padding)


def avg_pool_global(x):
    return jnp.mean(x, axis=(1, 2))


NONLINEARITIES: dict[str, Callable] = {
    "ReLU": nn.relu,
    "relu": nn.relu,
    "GELU": nn.gelu,
    "gelu": nn.gelu,
    "LeakyReLU": lambda x: nn.leaky_relu(x, 0.2),
    "leakyrelu": lambda x: nn.leaky_relu(x, 0.2),
    "Sigmoid": nn.sigmoid,
    "sigmoid": nn.sigmoid,
    "Tanh": nn.tanh,
    "tanh": nn.tanh,
    "elu": nn.elu,
}
