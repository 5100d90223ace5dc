"""Small vision architectures for gradient-inversion experiments.

TPU-native re-implementations (NHWC, flax) of the reference model zoo
(reference: breaching/cases/models/model_preparation.py — ConvNet:437, ConvNetSmall:408,
LeNetZhu:482, cnn6 via model_preparation.py:364-385, MLP:386-401, linear:236-240).
Every classifier sows its pre-head features into 'intermediates' under
'features' so feature-space regularizers work without forward hooks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Conv, Dense, max_pool, avg_pool_global


class ConvNet(nn.Module):
    """The 8-conv BatchNorm ConvNet used as the default small model.

    Architecture parity with reference ConvNet (model_preparation.py:437-479):
    widths [w, 2w, 2w, 4w, 4w, 4w | pool3 | 4w, 4w | pool3], then a linear head
    on the 36*w flattened features (for 32x32 inputs).
    """

    width: int = 32
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = [1, 2, 2, 4, 4, 4, 4, 4]
        pools_after = {5, 7}
        for idx, w in enumerate(widths):
            x = Conv(w * self.width, name=f"conv{idx}")(x)
            x = BatchNorm(name=f"bn{idx}")(x, use_running_average=not train)
            x = nn.relu(x)
            if idx in pools_after:
                x = max_pool(x, 3)
        x = x.reshape((x.shape[0], -1))
        self.sow("intermediates", "features", x)
        return Dense(self.num_classes, name="head")(x)


class ConvNetSmall(nn.Module):
    """BN-free small ConvNet (reference ConvNetSmall, model_preparation.py:408-435)."""

    width: int = 32
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(Conv(self.width, name="conv0")(x))
        x = nn.relu(Conv(2 * self.width, name="conv1")(x))
        x = nn.relu(Conv(4 * self.width, strides=(2, 2), name="conv2")(x))
        x = max_pool(x, 3)
        x = nn.relu(Conv(4 * self.width, strides=(2, 2), name="conv3")(x))
        x = avg_pool_global(x)
        self.sow("intermediates", "features", x)
        return Dense(self.num_classes, name="head")(x)


class LeNetZhu(nn.Module):
    """Sigmoid LeNet variant from the original DLG work (reference: model_preparation.py:482-513).

    All weights/biases are initialized U(-0.5, 0.5) as in the original repo.
    """

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        uniform = lambda key, shape, dtype=jnp.float32: jax.random.uniform(key, shape, dtype, -0.5, 0.5)
        conv = lambda feats, stride, name: nn.Conv(
            feats, (5, 5), strides=(stride, stride), padding=[(2, 2), (2, 2)],
            kernel_init=uniform, bias_init=uniform, name=name,
        )
        x = nn.sigmoid(conv(12, 2, "conv0")(x))
        x = nn.sigmoid(conv(12, 2, "conv1")(x))
        x = nn.sigmoid(conv(12, 1, "conv2")(x))
        x = x.reshape((x.shape[0], -1))
        self.sow("intermediates", "features", x)
        return nn.Dense(self.num_classes, kernel_init=uniform, bias_init=uniform, name="head")(x)


class CNN6(nn.Module):
    """The 6-layer LeakyReLU CNN attacked by R-GAP (reference: model_preparation.py:364-385).

    Bias-free strided convolutions ending in a linear head. Layer 0 expands the
    input (12@17x17 from 3@32x32), so each backward least-squares solve is
    overdetermined — this is what makes the recursion exact.
    """

    num_classes: int = 10

    # (features, kernel, stride, padding) per conv layer; shared with the R-GAP plan
    SPECS = [(12, 4, 2, 2), (36, 3, 2, 1), (36, 3, 1, 1),
             (36, 3, 1, 1), (64, 3, 2, 1), (128, 3, 1, 1)]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for idx, (feats, k, stride, pad) in enumerate(self.SPECS):
            x = Conv(feats, kernel_size=(k, k), strides=(stride, stride),
                     padding=[(pad, pad), (pad, pad)], use_bias=False,
                     name=f"conv{idx}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape((x.shape[0], -1))
        self.sow("intermediates", "features", x)
        return Dense(self.num_classes, name="head")(x)


class ConvNetBeyond(nn.Module):
    """LeakyReLU conv stack with wide FC head and softmax outputs, from Wang et
    al. "Beyond Inferring Class Representatives" (reference: model_preparation.py:342-361)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        for feats, stride in [(32, 2), (64, 1), (128, 2), (256, 1)]:
            x = Conv(feats, strides=(stride, stride), padding=[(1, 1), (1, 1)],
                     name=f"conv{feats}")(x)
            x = nn.leaky_relu(x, 0.01)
        x = x.reshape((x.shape[0], -1))
        width = x.shape[-1]
        x = nn.leaky_relu(Dense(width, name="linear0")(x), 0.01)
        self.sow("intermediates", "features", x)
        logits = Dense(self.num_classes, name="head")(x)
        return jax.nn.softmax(logits, axis=1)


class ConvNetTrivial(nn.Module):
    """Single wide conv + pool + head (reference: model_preparation.py:326-340)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(Conv(3072, padding=[(1, 1), (1, 1)], name="conv")(x))
        x = avg_pool_global(x)
        self.sow("intermediates", "features", x)
        return Dense(self.num_classes, name="head")(x)


class MLP(nn.Module):
    """Simple ReLU MLP (reference: model_preparation.py:386-401)."""

    widths: Sequence[int] = (1024, 1024, 1024)
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        for idx, w in enumerate(self.widths):
            x = nn.relu(Dense(w, name=f"linear{idx}")(x))
        self.sow("intermediates", "features", x)
        return Dense(self.num_classes, name="head")(x)


class LinearModel(nn.Module):
    """A single linear layer on flattened inputs — the analytic sanity-check model
    (reference: model_preparation.py:236-240). FC inversion is exact here."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        self.sow("intermediates", "features", x)
        return Dense(self.num_classes, name="head")(x)


class NoneModel(nn.Module):
    """Pass-through "model" that averages inputs into logits (debug baseline,
    reference: model_preparation.py:311-313 uses a select/identity stack)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        self.sow("intermediates", "features", x)
        pad = self.num_classes - x.shape[-1] % self.num_classes
        if pad != self.num_classes:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        return x.reshape(x.shape[0], self.num_classes, -1).mean(-1)
