"""Configurable flax ResNets (CIFAR and ImageNet stems, BasicBlock/Bottleneck,
BatchNorm or GroupNorm), NHWC throughout.

Capability parity with the reference's modified torchvision ResNet
(reference: breaching/cases/models/resnets.py:12-44 for the depth table,
model_preparation.py:245-281 for the CIFAR/GN construction). This is a fresh
implementation on flax idioms: norm layers are selected by name, batch statistics
are sown for the DeepInversion regularizer via the shared BatchNorm block, and
the classifier head is always named "head" with sown pre-head features.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Conv, Dense, GroupNorm, avg_pool_global, max_pool


def resnet_depths_to_config(depth: int):
    table = {
        20: ("basic", [3, 3, 3]),
        32: ("basic", [5, 5, 5]),
        56: ("basic", [9, 9, 9]),
        110: ("basic", [18, 18, 18]),
        18: ("basic", [2, 2, 2, 2]),
        34: ("basic", [3, 4, 6, 3]),
        50: ("bottleneck", [3, 4, 6, 3]),
        101: ("bottleneck", [3, 4, 23, 3]),
        152: ("bottleneck", [3, 8, 36, 3]),
    }
    if depth not in table:
        raise ValueError(f"Invalid ResNet depth {depth}.")
    return table[depth]


def _make_norm(norm: str, name: str):
    if norm.lower().startswith("group"):
        return GroupNorm(num_groups=4 if "4th" in norm else 32, name=name)
    return BatchNorm(name=name)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    norm: str = "BatchNorm2d"
    identity_nonlin: bool = False  # linearized prefix for deep imprint placement

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = (lambda v: v) if self.identity_nonlin else nn.relu
        residual = x
        y = Conv(self.features, strides=(self.strides, self.strides), use_bias=False, name="conv1")(x)
        y = _make_norm(self.norm, "bn1")(y, use_running_average=not train)
        y = act(y)
        y = Conv(self.features, use_bias=False, name="conv2")(y)
        y = _make_norm(self.norm, "bn2")(y, use_running_average=not train)
        if residual.shape != y.shape:
            residual = Conv(self.features, kernel_size=(1, 1), strides=(self.strides, self.strides),
                            use_bias=False, name="downsample_conv")(x)
            residual = _make_norm(self.norm, "downsample_norm")(residual, use_running_average=not train)
        return act(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x this
    strides: int = 1
    norm: str = "BatchNorm2d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = Conv(self.features, kernel_size=(1, 1), use_bias=False, name="conv1")(x)
        y = _make_norm(self.norm, "bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(self.features, strides=(self.strides, self.strides), use_bias=False, name="conv2")(y)
        y = _make_norm(self.norm, "bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = Conv(4 * self.features, kernel_size=(1, 1), use_bias=False, name="conv3")(y)
        y = _make_norm(self.norm, "bn3")(y, use_running_average=not train)
        if residual.shape != y.shape:
            residual = Conv(4 * self.features, kernel_size=(1, 1), strides=(self.strides, self.strides),
                            use_bias=False, name="downsample_conv")(x)
            residual = _make_norm(self.norm, "downsample_norm")(residual, use_running_average=not train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet over NHWC images.

    stem="CIFAR": 3x3 stem conv, no max-pool (3-stage nets, width 16*k).
    stem="ImageNet": 7x7/2 stem conv + 3x3/2 max-pool (4-stage nets, width 64*k).
    """

    block: str = "basic"  # "basic" | "bottleneck"
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 1000
    stem: str = "ImageNet"
    width: int = 64
    norm: str = "BatchNorm2d"
    strides: Sequence[int] = (1, 2, 2, 2)
    # deep malicious placement (reference _place_malicious_block + linearize,
    # servers.py:240-312): imprint_block runs before stage `imprint_position`;
    # with linear_prefix the preceding nonlinearities become identities.
    imprint_block: nn.Module | None = None
    imprint_position: int = 0
    linear_prefix: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def prefix_act(stage_idx):
            linear = (self.imprint_block is not None and self.linear_prefix
                      and stage_idx < self.imprint_position)
            return (lambda v: v) if linear else nn.relu

        if self.stem == "ImageNet":
            x = Conv(self.width, kernel_size=(7, 7), strides=(2, 2), use_bias=False, name="stem_conv")(x)
            x = _make_norm(self.norm, "stem_norm")(x, use_running_average=not train)
            x = prefix_act(0)(x)
            x = max_pool(x, 3, 2, padding=((1, 1), (1, 1)))
        else:
            x = Conv(self.width, kernel_size=(3, 3), use_bias=False, name="stem_conv")(x)
            x = _make_norm(self.norm, "stem_norm")(x, use_running_average=not train)
            x = prefix_act(0)(x)

        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        features = self.width
        for stage, (num_blocks, stride) in enumerate(zip(self.layers, self.strides)):
            if self.imprint_block is not None and stage == self.imprint_position:
                x = self.imprint_block(x, train=train)
            for block_idx in range(num_blocks):
                extra = {}
                if self.block == "basic":
                    extra = dict(identity_nonlin=self.imprint_block is not None
                                 and self.linear_prefix and stage < self.imprint_position)
                x = block_cls(
                    features,
                    strides=stride if block_idx == 0 else 1,
                    norm=self.norm,
                    name=f"stage{stage}_block{block_idx}",
                    **extra,
                )(x, train=train)
            features *= 2

        x = avg_pool_global(x)
        self.sow("intermediates", "features", x)
        return Dense(self.num_classes, name="head")(x)


def build_resnet(model_name: str, channels: int, classes: int, is_imagenet_data: bool) -> ResNet:
    """Parse names like resnet18 / resnet50 / ResNet32-10 / resnetgn20-4 into a ResNet."""
    lname = model_name.lower()
    norm = "groupnorm4th" if "resnetgn" in lname else "BatchNorm2d"
    if "-" in lname:
        depth = int("".join(filter(str.isdigit, lname.split("-")[0])))
        width_mult = int("".join(filter(str.isdigit, lname.split("-")[1])))
    else:
        depth = int("".join(filter(str.isdigit, lname)))
        width_mult = 1
    block, layers = resnet_depths_to_config(depth)
    if is_imagenet_data:
        stem, base_width = "ImageNet", 64
        strides = (1, 2, 2, 2)
    else:
        stem = "CIFAR"
        base_width = 16 if len(layers) < 4 else 64
        strides = (1, 2, 2, 2)[: len(layers)]
    return ResNet(
        block=block,
        layers=layers,
        num_classes=classes,
        stem=stem,
        width=base_width * width_mult,
        norm=norm,
        strides=strides,
    )
