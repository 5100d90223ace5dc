"""Normalizer-free networks (NFNet F0-F7) in flax, NHWC.

Full-fidelity counterpart of reference breaching/cases/models/nfnets.py (the
benjs/nfnets_pytorch implementation): scaled weight-standardized convolutions
(gain + eps=1e-4, unbiased variance), the four-conv bottleneck block
(1x1 -> grouped 3x3 stride -> grouped 3x3 -> 1x1) with group size 128,
zero-initialized per-block skip_gain, squeeze-excite with the x*2*sigmoid
scaling, avg-pool shortcut on downsampling blocks, the variance-propagation
beta schedule (reset at stage starts, reference nfnets.py:165-183), the
2x-width final conv, and the N(0, 0.01) head init.

Deliberate deviations, documented:
- stochastic depth / dropout are omitted: the framework only attacks fixed
  checkpoints in eval mode, where both are identity (reference
  nfnets.py:385-402 gates on self.training).
- the reference's downsampling shortcut uses AvgPool2d(2, 2, padding=1) for
  the ImageNet stem (nfnets.py:267-270), which produces ceil(H/2)+? vs the
  conv branch's ceil(H/2) — a shape mismatch that crashes on any even input;
  we use padding=0 (the upstream benjs/nfnets behavior) on both stems.
- reference model_preparation.py:188 passes activation="ReLU", which KeyErrors
  in its own activations_dict ({"gelu", "relu"}); activation lookup here is
  case-insensitive.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Dense, avg_pool_global

# variance-preserving activation gains (reference nfnets.py:83-100)
_VP_GAINS = {"gelu": 1.7015043497085571, "relu": 1.7139588594436646}

# reference nfnets.py:11-77 (train/test imsize + RA/drop rate are training-only)
nfnet_params = {
    "F0": {"width": [256, 512, 1536, 1536], "depth": [1, 2, 6, 3]},
    "F1": {"width": [256, 512, 1536, 1536], "depth": [2, 4, 12, 6]},
    "F2": {"width": [256, 512, 1536, 1536], "depth": [3, 6, 18, 9]},
    "F3": {"width": [256, 512, 1536, 1536], "depth": [4, 8, 24, 12]},
    "F4": {"width": [256, 512, 1536, 1536], "depth": [5, 10, 30, 15]},
    "F5": {"width": [256, 512, 1536, 1536], "depth": [6, 12, 36, 18]},
    "F6": {"width": [256, 512, 1536, 1536], "depth": [7, 14, 42, 21]},
    "F7": {"width": [256, 512, 1536, 1536], "depth": [8, 16, 48, 24]},
}


def _vp_act(x, activation: str):
    name = activation.lower()
    fn = nn.gelu if name == "gelu" else nn.relu
    return fn(x) * _VP_GAINS[name]


class WSConv(nn.Module):
    """Scaled weight-standardized conv (reference WSConv2D, nfnets.py:317-361):
    per-output-channel standardization with unbiased variance, learnable gain,
    eps 1e-4, xavier-normal init."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str | Sequence = "torch"  # "torch" = symmetric k//2 (torch p=1 for 3x3)
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.xavier_normal(),
                            (*self.kernel_size, in_features // self.groups, self.features))
        gain = self.param("gain", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        fan_in = np.prod(self.kernel_size) * (in_features // self.groups)
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True, ddof=1)
        w = (kernel - mean) * jax.lax.rsqrt(jnp.maximum(var * fan_in, 1e-4))
        w = w * gain
        padding = self.padding
        if padding == "torch":
            padding = tuple((k // 2, k // 2) for k in self.kernel_size)
        y = jax.lax.conv_general_dilated(
            x, w, self.strides, padding, feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class Stem(nn.Module):
    """Four-conv stem (reference Stem, nfnets.py:208-226): 16-32-64-128 with
    VALID padding (the reference's WSConv2D default padding=0) and the stem
    stride on conv0/conv3 (2 for ImageNet, 1 for CIFAR)."""

    stride: int = 2
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        s = (self.stride, self.stride)
        x = _vp_act(WSConv(16, (3, 3), s, padding="VALID", name="conv0")(x), self.activation)
        x = _vp_act(WSConv(32, (3, 3), padding="VALID", name="conv1")(x), self.activation)
        x = _vp_act(WSConv(64, (3, 3), padding="VALID", name="conv2")(x), self.activation)
        return WSConv(128, (3, 3), s, padding="VALID", name="conv3")(x)


class SqueezeExcite(nn.Module):
    """reference SqueezeExcite (nfnets.py:364-383); callers scale by 2x."""

    features: int
    ratio: float = 0.5
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        hidden = max(int(self.features * self.ratio), 1)
        s = avg_pool_global(x)
        s = _vp_act(Dense(hidden, name="fc0")(s), self.activation)
        s = nn.sigmoid(Dense(self.features, name="fc1")(s))
        return s[:, None, None, :]


class NFBlock(nn.Module):
    """reference NFBlock (nfnets.py:229-309): four WS convs, grouped 3x3s,
    avg-pool downsampling shortcut, SE, zero-init skip_gain."""

    in_features: int
    features: int
    strides: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    se_ratio: float = 0.5
    group_size: int = 128
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        width = int(self.features * 0.5)  # expansion 0.5
        groups = max(width // self.group_size, 1)
        width = self.group_size * groups if width >= self.group_size else width

        out = _vp_act(x, self.activation) * self.beta

        use_projection = self.strides > 1 or self.in_features != self.features
        if self.strides > 1:
            shortcut = nn.avg_pool(out, (2, 2), strides=(2, 2), padding="VALID")
            shortcut = WSConv(self.features, (1, 1), name="conv_shortcut")(shortcut)
        elif use_projection:
            shortcut = WSConv(self.features, (1, 1), name="conv_shortcut")(out)
        else:
            shortcut = x

        y = _vp_act(WSConv(width, (1, 1), name="conv0")(out), self.activation)
        y = _vp_act(WSConv(width, (3, 3), (self.strides, self.strides),
                           groups=groups, name="conv1")(y), self.activation)
        y = _vp_act(WSConv(width, (3, 3), groups=groups, name="conv1b")(y), self.activation)
        y = WSConv(self.features, (1, 1), name="conv2")(y)
        y = (SqueezeExcite(self.features, self.se_ratio, self.activation,
                           name="squeeze_excite")(y) * 2.0) * y

        skip_gain = self.param("skip_gain", nn.initializers.zeros, ())
        return y * self.alpha * skip_gain + shortcut


class NFNet(nn.Module):
    """Normalizer-free net, variants F0-F7 (reference NFNet, nfnets.py:105-205)."""

    num_classes: int = 1000
    variant: str = "F0"
    stem: str = "ImageNet"
    alpha: float = 0.2
    se_ratio: float = 0.5
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        params = nfnet_params[self.variant]
        widths, depths = params["width"], params["depth"]
        stage_strides = [1, 2, 2, 2]

        x = Stem(stride=2 if self.stem == "ImageNet" else 1,
                 activation=self.activation, name="stem")(x)

        expected_std = 1.0
        in_features = widths[0] // 2  # stem output width
        index = 0
        for stage, (width, depth, stride) in enumerate(zip(widths, depths, stage_strides)):
            for block_index in range(depth):
                beta = 1.0 / expected_std
                x = NFBlock(in_features, width,
                            strides=stride if block_index == 0 else 1,
                            alpha=self.alpha, beta=beta, se_ratio=self.se_ratio,
                            activation=self.activation,
                            name=f"stage{stage}_block{block_index}")(x)
                in_features = width
                index += 1
                # reference nfnets.py:178-183: reset at stage start, then grow
                if block_index == 0:
                    expected_std = 1.0
                expected_std = (expected_std ** 2 + self.alpha ** 2) ** 0.5

        x = WSConv(2 * in_features, (1, 1), name="final_conv")(x)
        x = _vp_act(x, self.activation)
        x = avg_pool_global(x)
        self.sow("intermediates", "features", x)
        head_init = nn.initializers.normal(stddev=0.01)
        return Dense(self.num_classes, kernel_init=head_init, name="linear")(x)
