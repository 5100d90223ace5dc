"""DenseNet in flax, NHWC (capability parity with reference
breaching/cases/models/densenets.py, torchvision-derived)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Conv, Dense, avg_pool_global, max_pool


def densenet_depths_to_config(depth: int):
    table = {
        121: (32, (6, 12, 24, 16), 64),
        161: (48, (6, 12, 36, 24), 96),
        169: (32, (6, 12, 32, 32), 64),
        201: (32, (6, 12, 48, 32), 64),
    }
    if depth not in table:
        raise ValueError(f"Invalid DenseNet depth {depth}.")
    return table[depth]


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BatchNorm(name="norm1")(x, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.bn_size * self.growth_rate, kernel_size=(1, 1), use_bias=False, name="conv1")(y)
        y = BatchNorm(name="norm2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.growth_rate, use_bias=False, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="norm")(x, use_running_average=not train)
        x = nn.relu(x)
        x = Conv(self.features, kernel_size=(1, 1), use_bias=False, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    num_classes: int = 10
    stem: str = "CIFAR"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stem == "ImageNet":
            x = Conv(self.num_init_features, kernel_size=(7, 7), strides=(2, 2),
                     use_bias=False, name="stem_conv")(x)
            x = BatchNorm(name="stem_norm")(x, use_running_average=not train)
            x = nn.relu(x)
            x = max_pool(x, 3, 2, padding=((1, 1), (1, 1)))
        else:
            x = Conv(self.num_init_features, use_bias=False, name="stem_conv")(x)

        features = self.num_init_features
        for stage, num_layers in enumerate(self.block_config):
            for i in range(num_layers):
                x = DenseLayer(self.growth_rate, self.bn_size,
                               name=f"block{stage}_layer{i}")(x, train=train)
            features += num_layers * self.growth_rate
            if stage != len(self.block_config) - 1:
                features //= 2
                x = Transition(features, name=f"transition{stage}")(x, train=train)

        x = BatchNorm(name="final_norm")(x, use_running_average=not train)
        x = nn.relu(x)
        x = avg_pool_global(x)
        self.sow("intermediates", "features", x)
        return Dense(self.num_classes, name="head")(x)
