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


def test_tv_custom_vjp_matches_autodiff():
    """The closed-form TV backward must equal autodiff for all exponent configs."""
    import jax

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 12, 3))
    for p, q, dop in [(1.0, 1.0, False), (2.0, 0.5, False), (2.0, 1.25, False),
                      (1.0, 1.0, True), (2.0, 0.5, True)]:
        tv = TotalVariation(scale=1.0, eps=1e-6, inner_exp=p, outer_exp=q,
                            double_opponents=dop)

        def generic(img):
            xx = img
            if dop:
                xx = jnp.concatenate([xx, xx[..., 0:1] - xx[..., 1:2],
                                      xx[..., 0:1] - xx[..., 2:3],
                                      xx[..., 1:2] - xx[..., 2:3]], axis=-1)
            dx = jnp.diff(xx, axis=2, append=xx[:, :, -1:, :])
            dy = jnp.diff(xx, axis=1, append=xx[:, -1:, :, :])
            return jnp.mean(jnp.power(jnp.power(jnp.abs(dx) + 1e-6, p)
                                      + jnp.power(jnp.abs(dy) + 1e-6, p), q))

        np.testing.assert_allclose(float(tv(x)), float(generic(x)), rtol=1e-5)
        g1 = jax.grad(lambda img: tv(img))(x)
        g2 = jax.grad(generic)(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6,
                                   err_msg=f"p={p} q={q} dop={dop}")


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
