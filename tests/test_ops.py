"""Pallas op correctness tests (interpret mode on CPU) against XLA references."""

import jax
import jax.numpy as jnp
import numpy as np

from breaching_tpu.ops import (
    box_project,
    fused_cosine_similarity,
    fused_euclidean,
    fused_total_variation,
)


def _rand(n, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (n,))


def test_fused_cosine_value_and_grad():
    rec, data = _rand(5000, 0), _rand(5000, 1)
    ref_fn = lambda r, d: 1.0 - jnp.vdot(r, d) / (jnp.linalg.norm(r) * jnp.linalg.norm(d) + 1e-12)
    np.testing.assert_allclose(
        float(fused_cosine_similarity(rec, data)), float(ref_fn(rec, data)), rtol=1e-5)
    g_fused = jax.grad(fused_cosine_similarity)(rec, data)
    g_ref = jax.grad(ref_fn)(rec, data)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-7)


def test_fused_euclidean_value_and_grad():
    rec, data = _rand(3000, 2), _rand(3000, 3)
    ref_fn = lambda r, d: 0.5 * jnp.sum(jnp.square(r - d))
    np.testing.assert_allclose(
        float(fused_euclidean(rec, data)), float(ref_fn(rec, data)), rtol=1e-5)
    g_fused = jax.grad(fused_euclidean)(rec, data)
    g_ref = jax.grad(ref_fn)(rec, data)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-6)


def test_fused_tv_matches_regularizer():
    from breaching_tpu.attacks.auxiliaries.regularizers import TotalVariation

    imgs = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 3))
    ref = TotalVariation(scale=1.0, eps=1e-8, inner_exp=1, outer_exp=1)(imgs)
    fused = fused_total_variation(imgs, 1.0, 1.0, 1e-8)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-4)


def test_box_project():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 3)) * 3
    lo = jnp.asarray([-1.0, -2.0, 0.0])
    hi = jnp.asarray([1.0, 0.5, 2.0])
    out = np.asarray(box_project(x, lo, hi))
    ref = np.clip(np.asarray(x), np.asarray(lo), np.asarray(hi))
    np.testing.assert_allclose(out, ref, rtol=1e-6)
