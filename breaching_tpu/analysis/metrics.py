"""Reconstruction-quality metrics in JAX.

Counterpart of reference breaching/analysis/metrics.py. PSNR/MSE follow
metrics.py:108-130; SSIM is a windowed implementation on-device; registered PSNR
(metrics.py:133-242, kornia homography in the reference) is implemented as a
jitted grid of small shift/scale registrations; IIP (metrics.py:245-295) is a
nearest-neighbor identifiability check over the user's data pool.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse_psnr(rec, ref, factor: float = 1.0, clip: bool = False):
    """Per-batch MSE and mean PSNR (reference: metrics.py:108-130)."""
    if clip:
        rec = jnp.clip(rec, 0, 1)
    mse_per = jnp.mean(jnp.square(rec - ref), axis=tuple(range(1, rec.ndim)))

    def one_psnr(mse):
        return jnp.where(
            mse > 0,
            10.0 * jnp.log10(factor ** 2 / jnp.maximum(mse, 1e-20)),
            jnp.inf,
        )

    psnrs = jax.vmap(one_psnr)(mse_per)
    finite = jnp.isfinite(psnrs)
    mean_psnr = jnp.where(
        finite.any(), jnp.nanmean(jnp.where(finite, psnrs, jnp.nan)), jnp.inf)
    return jnp.mean(mse_per), mean_psnr


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-jnp.square(coords) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(rec, ref, max_val: float = 1.0):
    """Mean SSIM over the batch, NHWC, per-channel gaussian windows."""
    kernel = _gaussian_kernel()[:, :, None, None]
    C = rec.shape[-1]
    kernel = jnp.tile(kernel, (1, 1, 1, C))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    mu_x, mu_y = filt(rec), filt(ref)
    sigma_x = filt(rec * rec) - mu_x ** 2
    sigma_y = filt(ref * ref) - mu_y ** 2
    sigma_xy = filt(rec * ref) - mu_x * mu_y
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2))
    return jnp.mean(ssim_map)


def _gabor_bank(size: int = 7, scales=(1.5, 3.0), orientations=4):
    """Complex Gabor filter bank for CW-SSIM (replaces the reference's
    pytorch_wavelets DTCWT, metrics.py:11-55 — an optional torch dependency)."""
    coords = np.arange(size) - (size - 1) / 2.0
    yy, xx = np.meshgrid(coords, coords, indexing="ij")
    kernels = []
    for sigma in scales:
        for k in range(orientations):
            theta = np.pi * k / orientations
            xr = xx * np.cos(theta) + yy * np.sin(theta)
            envelope = np.exp(-(xx ** 2 + yy ** 2) / (2 * sigma ** 2))
            wave = np.exp(1j * 2 * np.pi * xr / (2 * sigma))
            kern = envelope * wave
            kern -= kern.mean()  # zero DC
            kernels.append(kern / np.linalg.norm(kern))
    return np.stack(kernels)  # (S*O, size, size)


def cw_ssim(rec, ref, k: float = 1e-6):
    """Complex-wavelet SSIM over a Gabor bank: structure comparison in the
    complex coefficient domain, robust to small shifts (reference computes this
    via DTCWT; same index formula: (2|sum cx cy*| + K)/(sum|cx|^2+|cy|^2 + K)).

    Complex dtypes are unsupported on some TPU backends, so real and imaginary
    parts are carried explicitly."""
    bank = _gabor_bank()
    rec_g = jnp.mean(rec, axis=-1)  # luminance
    ref_g = jnp.mean(ref, axis=-1)

    def conv(img, kk):
        return jax.lax.conv_general_dilated(
            img[..., None], kk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]

    total = 0.0
    for kern in bank:
        kr = jnp.asarray(np.real(kern), jnp.float32)[:, :, None, None]
        ki = jnp.asarray(np.imag(kern), jnp.float32)[:, :, None, None]
        ar, ai = conv(rec_g, kr), conv(rec_g, ki)
        br, bi = conv(ref_g, kr), conv(ref_g, ki)
        # sum of cx * conj(cy) over pixels, then magnitude
        dot_re = jnp.sum(ar * br + ai * bi, axis=(1, 2))
        dot_im = jnp.sum(ai * br - ar * bi, axis=(1, 2))
        num = 2 * jnp.sqrt(dot_re ** 2 + dot_im ** 2) + k
        den = jnp.sum(ar ** 2 + ai ** 2 + br ** 2 + bi ** 2, axis=(1, 2)) + k
        total = total + jnp.mean(num / den)
    return total / len(bank)


def _grid_coords(H, W):
    ys = jnp.linspace(-1.0, 1.0, H)
    xs = jnp.linspace(-1.0, 1.0, W)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.ravel(), gy.ravel(), jnp.ones(H * W)], axis=0)  # (3, HW)


def _sample_normalized(img, src):
    """Bilinearly sample one [H, W, C] image at normalized [-1, 1] source
    coordinates src (2, HW) (differentiable, jit/vmap friendly)."""
    H, W, C = img.shape
    sx = (src[0] + 1.0) * (W - 1) / 2.0
    sy = (src[1] + 1.0) * (H - 1) / 2.0
    x0 = jnp.clip(jnp.floor(sx), 0, W - 2)
    y0 = jnp.clip(jnp.floor(sy), 0, H - 2)
    wx = jnp.clip(sx - x0, 0.0, 1.0)
    wy = jnp.clip(sy - y0, 0.0, 1.0)
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    def at(yy, xx):
        return img[yy, xx, :]

    out = (at(y0i, x0i) * ((1 - wy) * (1 - wx))[:, None]
           + at(y0i, x0i + 1) * ((1 - wy) * wx)[:, None]
           + at(y0i + 1, x0i) * (wy * (1 - wx))[:, None]
           + at(y0i + 1, x0i + 1) * (wy * wx)[:, None])
    return out.reshape(H, W, C)


def _affine_warp(img, theta):
    """Warp one [H, W, C] image through a 2x3 affine map (6 parameters)."""
    src = theta @ _grid_coords(*img.shape[:2])
    return _sample_normalized(img, src)


def _projective_warp(img, h8):
    """Warp one [H, W, C] image through a homography (8 parameters: the 3x3
    matrix with bottom-right pinned to 1, like kornia's ImageRegistrator
    'homography' model, reference metrics.py:133-242)."""
    Hm = jnp.concatenate([h8, jnp.ones((1,), h8.dtype)]).reshape(3, 3)
    src = Hm @ _grid_coords(*img.shape[:2])
    w = jnp.where(jnp.abs(src[2]) < 1e-6, jnp.sign(src[2]) * 1e-6 + 1e-12, src[2])
    return _sample_normalized(img, src[:2] / w)


_IDENTITY_THETA = np.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
_IDENTITY_H8 = np.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], np.float32)


def _register_warped(rec, ref, warp_fn, theta0_np, steps: int = 200, lr: float = 0.02):
    """Per-image gradient-based registration: optimize the warp parameters by
    Adam on MSE(warp(rec), ref). The jitted XLA counterpart of the reference's
    kornia ImageRegistrator (metrics.py:133-242)."""
    import optax

    def one(rec_i, ref_i):
        theta0 = jnp.asarray(theta0_np)
        opt = optax.adam(lr)

        def loss_fn(theta):
            return jnp.mean(jnp.square(warp_fn(rec_i, theta) - ref_i))

        def step(carry, _):
            theta, state = carry
            loss, grad = jax.value_and_grad(loss_fn)(theta)
            updates, state = opt.update(grad, state, theta)
            return (optax.apply_updates(theta, updates), state), loss

        (theta, _), _ = jax.lax.scan(step, (theta0, opt.init(theta0)),
                                     None, length=steps)
        return warp_fn(rec_i, theta)

    return jax.vmap(one)(rec, ref)


@jax.jit
def _register_affine(rec, ref):
    """6-parameter affine registration (translation/scale/rotation/shear)."""
    return _register_warped(rec, ref, _affine_warp, _IDENTITY_THETA)


@jax.jit
def _register_projective(rec, ref):
    """8-parameter projective registration — absorbs perspective components
    the affine map cannot (the reference's kornia model is a full homography).
    Smaller lr: the two perspective parameters scale pixel coordinates
    nonlinearly and overshoot at the affine step size."""
    return _register_warped(rec, ref, _projective_warp, _IDENTITY_H8,
                            steps=300, lr=0.01)


def registered_psnr(rec, ref, factor: float = 1.0):
    """Registration-robust PSNR (reference: metrics.py:133-242): the best of
    (a) the unregistered PSNR, (b) a dense grid of small integer translations,
    (c) a jitted per-image affine registration (6 params by Adam on MSE,
    absorbing the scale/rotation ambiguities the shift grid cannot), and
    (d) a projective (8-param homography) registration matching the
    reference's kornia model. Never below the unregistered value, matching
    the reference's max()."""
    shifts = [-2, -1, 0, 1, 2]

    def psnr_at(rec_s):
        _, p = mse_psnr(rec_s, ref, factor=factor, clip=True)
        return p

    best = psnr_at(rec)
    for dy in shifts:
        for dx in shifts:
            shifted = jnp.roll(rec, (dy, dx), axis=(1, 2))
            best = jnp.maximum(best, psnr_at(shifted))
    best = jnp.maximum(best, psnr_at(_register_affine(rec, ref)))
    best = jnp.maximum(best, psnr_at(_register_projective(rec, ref)))
    return best


def image_identifiability_precision(rec_denorm, true_denorm, pool_denorm):
    """IIP (reference: metrics.py:245-295): fraction of reconstructions whose
    nearest neighbor in the candidate pool (true data + decoys) is the matching
    true image. Distances in pixel space (the reference optionally uses LPIPS
    features; pixel space is its fallback)."""
    B = rec_denorm.shape[0]
    pool = jnp.concatenate([true_denorm, pool_denorm], axis=0)
    rec_flat = rec_denorm.reshape(B, -1)
    pool_flat = pool.reshape(pool.shape[0], -1)
    d = jnp.sum(jnp.square(rec_flat[:, None, :] - pool_flat[None, :, :]), axis=-1)
    nn_idx = jnp.argmin(d, axis=1)
    return jnp.mean((nn_idx == jnp.arange(B)).astype(jnp.float32))


def compute_batch_order(rec, ref, lpips_scorer=None):
    """Match reconstructed to true images by solving the assignment problem on an
    all-pairs cost matrix (reference: analysis.py:332-375 — LPIPS cost +
    linear_sum_assignment). The cost is LPIPS-feature distance when a scorer is
    available, pixel MSE otherwise; the cost matrix is computed on-device, the
    small assignment solve stays on host."""
    from scipy.optimize import linear_sum_assignment

    B = rec.shape[0]
    if B == 1:
        return np.asarray([0])
    if lpips_scorer is not None:
        rec_flat = lpips_scorer.features(rec)
        ref_flat = lpips_scorer.features(ref)
    else:
        rec_flat = rec.reshape(B, -1)
        ref_flat = ref.reshape(B, -1)
    cost = jax.jit(lambda a, b: jnp.mean(
        jnp.square(a[:, None, :] - b[None, :, :]), axis=-1))(ref_flat, rec_flat)
    _, order = linear_sum_assignment(np.asarray(cost))
    return order


def gradient_uniqueness(grads_per_example):
    """Diagnostic: fraction of gradient entries touched by exactly one datapoint
    (reference: metrics.py:58-105)."""
    leaves = [jnp.stack([jnp.abs(g) > 0 for g in ex]) for ex in
              zip(*[jax.tree_util.tree_leaves(g) for g in grads_per_example])]
    total = unique = 0
    for stack in leaves:
        counts = jnp.sum(stack, axis=0)
        unique += jnp.sum(counts == 1)
        total += counts.size
    return unique / max(total, 1)
