"""Regularizer tests against hand-computed values."""

import jax.numpy as jnp
import numpy as np

from breaching_tpu.attacks.auxiliaries.regularizers import (
    NormRegularization,
    OrthogonalityRegularization,
    TotalVariation,
)


def test_tv_constant_image_is_zero():
    img = jnp.ones((1, 8, 8, 3)) * 0.3
    val = TotalVariation(scale=1.0, eps=0.0)(img)
    assert np.isclose(float(val), 0.0, atol=1e-7)


def test_tv_step_edge():
    img = jnp.zeros((1, 1, 4, 1)).at[0, 0, 2:, 0].set(1.0)
    # dx (forward diff, replicate boundary): [0,1,0,0]; dy: 0
    # inner p=1, outer q=1 -> mean = 1/4
    val = TotalVariation(scale=1.0, eps=0.0, inner_exp=1, outer_exp=1)(img)
    assert np.isclose(float(val), 0.25, atol=1e-6)


def test_norm_regularizer():
    img = jnp.full((1, 2, 2, 1), 2.0)
    # 1/p * mean(|x|^p) * scale = 0.5 * 4 * 1 = 2
    val = NormRegularization(scale=1.0, pnorm=2.0)(img)
    assert np.isclose(float(val), 2.0)


def test_orthogonality_single_image_zero():
    img = jnp.ones((1, 4, 4, 3))
    val = OrthogonalityRegularization(scale=1.0)(img)
    assert float(val) == 0.0


def test_orthogonality_detects_identical_images():
    img = jnp.ones((2, 2, 2, 1))
    ortho = jnp.stack([jnp.ones((2, 2, 1)), -jnp.ones((2, 2, 1))])
    v_same = OrthogonalityRegularization(scale=1.0)(img)
    assert float(v_same) > 0
