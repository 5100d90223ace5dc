"""Registration-based R-PSNR (reference: metrics.py:133-242)."""

import jax
import jax.numpy as jnp
import numpy as np

from breaching_tpu.analysis.metrics import (_affine_warp, mse_psnr,
                                            registered_psnr)


def _smooth_images(key, n=2, side=32):
    x = jax.random.normal(key, (n, 8, 8, 3))
    return jax.nn.sigmoid(2 * jax.image.resize(x, (n, side, side, 3), "bilinear"))


def _shift_grid_psnr(rec, ref):
    best = mse_psnr(rec, ref, clip=True)[1]
    for dy in (-2, -1, 0, 1, 2):
        for dx in (-2, -1, 0, 1, 2):
            best = jnp.maximum(
                best, mse_psnr(jnp.roll(rec, (dy, dx), axis=(1, 2)), ref, clip=True)[1])
    return best


def test_catches_scale_perturbation_shift_grid_misses():
    img = _smooth_images(jax.random.PRNGKey(0))
    theta = jnp.asarray([[1 / 1.05, 0, 0], [0, 1 / 1.05, 0]])
    scaled = jax.vmap(lambda im: _affine_warp(im, theta))(img)
    shift_best = float(_shift_grid_psnr(scaled, img))
    registered = float(registered_psnr(scaled, img))
    assert registered > shift_best + 3, (shift_best, registered)


def test_never_below_shift_grid():
    key = jax.random.PRNGKey(1)
    for perturb in ("noise", "shift", "rotate"):
        img = _smooth_images(jax.random.fold_in(key, hash(perturb) % 1000))
        if perturb == "noise":
            rec = img + 0.05 * jax.random.normal(key, img.shape)
        elif perturb == "shift":
            rec = jnp.roll(img, (1, 2), axis=(1, 2))
        else:
            c, s = np.cos(0.05), np.sin(0.05)
            theta = jnp.asarray([[c, -s, 0], [s, c, 0]])
            rec = jax.vmap(lambda im: _affine_warp(im, theta))(img)
        shift_best = float(_shift_grid_psnr(rec, img))
        registered = float(registered_psnr(rec, img))
        assert registered >= shift_best - 1e-4, (perturb, shift_best, registered)


def test_identical_images_infinite():
    img = _smooth_images(jax.random.PRNGKey(2), n=1)
    assert not np.isfinite(float(registered_psnr(img, img)))
