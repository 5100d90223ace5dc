"""Normalizer-free network (NFNet-F0-style) in flax, NHWC.

Capability parity with reference breaching/cases/models/nfnets.py: scaled
weight-standardized convolutions, variance-preserving residual blocks with
alpha/beta scaling, squeeze-excite. Stochastic depth is omitted (the reference
only attacks fixed checkpoints; dropout paths are inactive there too).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Dense, avg_pool_global, torch_kaiming_uniform

_GAMMA_GELU = 1.7015043497085571  # variance-preserving gain for gelu


class WSConv(nn.Module):
    """Scaled weight standardization conv (NFNet building block)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_kaiming_uniform(),
                            (*self.kernel_size, in_features, self.features))
        gain = self.param("gain", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        fan_in = np.prod(self.kernel_size) * in_features
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True)
        w = (kernel - mean) / jnp.sqrt(jnp.maximum(var * fan_in, 1e-4))
        w = w * gain
        y = jax.lax.conv_general_dilated(
            x, w, self.strides, "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class SqueezeExcite(nn.Module):
    features: int
    ratio: float = 0.5

    @nn.compact
    def __call__(self, x):
        hidden = max(int(self.features * self.ratio), 1)
        s = avg_pool_global(x)
        s = nn.relu(Dense(hidden, name="fc0")(s))
        s = nn.sigmoid(Dense(self.features, name="fc1")(s))
        return x * 2.0 * s[:, None, None, :]


class NFBlock(nn.Module):
    features: int
    strides: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    se_ratio: float = 0.5

    @nn.compact
    def __call__(self, x):
        out = nn.gelu(x * self.beta) * _GAMMA_GELU
        shortcut = x
        if self.strides > 1 or x.shape[-1] != self.features:
            shortcut = WSConv(self.features, (1, 1), (self.strides, self.strides),
                              name="shortcut")(out)
        y = WSConv(self.features // 2, (1, 1), name="conv0")(out)
        y = nn.gelu(y) * _GAMMA_GELU
        y = WSConv(self.features // 2, (3, 3), (self.strides, self.strides), name="conv1")(y)
        y = nn.gelu(y) * _GAMMA_GELU
        y = WSConv(self.features, (1, 1), name="conv2")(y)
        y = SqueezeExcite(self.features, self.se_ratio, name="se")(y)
        return shortcut + self.alpha * y


class NFNet(nn.Module):
    """F0-style normalizer-free net."""

    num_classes: int = 1000
    stem: str = "ImageNet"
    widths: Sequence[int] = (256, 512, 1536, 1536)
    depths: Sequence[int] = (1, 2, 6, 3)
    alpha: float = 0.2
    se_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stem == "ImageNet":
            x = WSConv(16, (3, 3), (2, 2), name="stem0")(x)
            x = nn.gelu(x) * _GAMMA_GELU
            x = WSConv(32, (3, 3), name="stem1")(x)
            x = nn.gelu(x) * _GAMMA_GELU
            x = WSConv(64, (3, 3), name="stem2")(x)
            x = nn.gelu(x) * _GAMMA_GELU
            x = WSConv(128, (3, 3), (2, 2), name="stem3")(x)
        else:  # CIFAR stem
            x = WSConv(128, (3, 3), name="stem0")(x)

        expected_var = 1.0
        for stage, (width, depth) in enumerate(zip(self.widths, self.depths)):
            for block_idx in range(depth):
                beta = 1.0 / np.sqrt(expected_var)
                strides = 2 if (block_idx == 0 and stage > 0) else 1
                x = NFBlock(width, strides, self.alpha, beta, self.se_ratio,
                            name=f"stage{stage}_block{block_idx}")(x)
                expected_var = 1.0 if block_idx == 0 else expected_var + self.alpha ** 2

        x = nn.gelu(x) * _GAMMA_GELU
        x = avg_pool_global(x)
        self.sow("intermediates", "features", x)
        return Dense(self.num_classes, name="head")(x)
