"""DTCWT + CW-SSIM validation (reference breaching/analysis/metrics.py:11-55).

pytorch_wavelets is unavailable (torch-only package, zero-egress env), so the
filter constants and transform conventions are validated from first principles:
the Kingsbury banks are fully determined by algebraic identities
(biorthogonal perfect reconstruction, even-shift orthonormality, quarter-sample
delay), and the dual-tree property is checked behaviorally (analyticity,
shift-invariance of magnitudes) instead of against library goldens.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from breaching_tpu.analysis.dtcwt import (
    NEAR_SYM_B_H0O, NEAR_SYM_B_H1O,
    QSHIFT_B_H0A, QSHIFT_B_H0B, QSHIFT_B_H1A, QSHIFT_B_H1B,
    dtcwt2d, dtcwt_cw_ssim,
)


# ---------- filter-bank identities (checksum the recalled constants) --------

def test_near_sym_b_perfect_reconstruction():
    """Biorthogonal PR: P(z) = H0(z)G0(z) with g0[n] = (-1)^n h1[n] must be
    halfband — even taps zero except the center, center = 1."""
    g0 = NEAR_SYM_B_H1O * (-1.0) ** (np.arange(len(NEAR_SYM_B_H1O)) + 1)
    p = np.convolve(NEAR_SYM_B_H0O, g0)
    center = (len(p) - 1) // 2
    # With the sum-1 normalization these constants use, P(z)+P(-z)=1 means the
    # even part is halfband with center 1/2.
    assert abs(p[center] - 0.5) < 1e-6
    even = p[center % 2::2].copy()
    even[np.argmin(np.abs(np.arange(center % 2, len(p), 2) - center))] = 0.0
    assert np.max(np.abs(even)) < 1e-6


def test_near_sym_b_dc_and_symmetry():
    # sum-1 normalization (pytorch_wavelets stores this bank the same way;
    # a global scale cancels in the CW-SSIM ratio)
    assert abs(NEAR_SYM_B_H0O.sum() - 1.0) < 1e-5
    assert abs(NEAR_SYM_B_H1O.sum()) < 1e-6
    np.testing.assert_allclose(NEAR_SYM_B_H0O, NEAR_SYM_B_H0O[::-1])
    np.testing.assert_allclose(NEAR_SYM_B_H1O, NEAR_SYM_B_H1O[::-1])


def test_qshift_b_orthonormality():
    """Orthonormal to even shifts: sum_n h[n] h[n+2k] = delta(k)."""
    h = QSHIFT_B_H0A
    for k in range(len(h) // 2):
        ip = np.dot(h[: len(h) - 2 * k], h[2 * k:])
        assert abs(ip - (1.0 if k == 0 else 0.0)) < 1e-8, k
    assert abs(h.sum() - np.sqrt(2)) < 1e-6


def test_qshift_b_half_sample_tree_offset():
    """Tree b is the time reverse of tree a, so their DC group delays sum to
    N-1; the q-shift property is that they differ by half a sample — the
    Hilbert condition that makes magnitudes shift-invariant after decimation."""
    h = QSHIFT_B_H0A
    n = np.arange(len(h))
    delay_a = np.dot(n, h) / h.sum()
    delay_b = (len(h) - 1) - delay_a
    assert abs(abs(delay_b - delay_a) - 0.5) < 0.1
    np.testing.assert_allclose(QSHIFT_B_H0B, QSHIFT_B_H0A[::-1])
    np.testing.assert_allclose(QSHIFT_B_H1B, QSHIFT_B_H1A[::-1])


# ---------- transform behavior ----------------------------------------------

def _rng(seed=0):
    return np.random.default_rng(seed)


def test_dtcwt_shapes_and_energy():
    x = _rng().normal(size=(2, 64, 64)).astype(np.float32)
    out = dtcwt2d(jnp.asarray(x), levels=3)
    assert len(out) == 3
    for lvl, (re, im) in enumerate(out):
        h = 64 // 2 ** (lvl + 1)
        assert re.shape == (2, 6, h, h) and im.shape == re.shape
        assert np.isfinite(np.asarray(re)).all() and np.isfinite(np.asarray(im)).all()
    # white noise spreads energy across subbands: every orientation active
    mags = np.asarray(jnp.sqrt(out[1][0] ** 2 + out[1][1] ** 2))
    assert (mags.mean(axis=(0, 2, 3)) > 1e-3).all()


def test_dtcwt_orientation_selectivity():
    """A 45-degree diagonal grating excites one diagonal orientation far more
    than the opposite diagonal — the defining advantage over separable DWTs,
    which cannot tell +45 from -45."""
    n = 64
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    # +45-degree oriented sinusoid at a mid frequency
    img = np.cos(2 * np.pi * (xx + yy) * 0.15)[None]
    out = dtcwt2d(jnp.asarray(img), levels=2)
    re, im = out[1]
    energy = np.asarray((re ** 2 + im ** 2).sum(axis=(0, 2, 3)))
    # the six subbands hold two opposite-diagonal pairs; the strongest
    # diagonal response must dominate its mirror by a large factor
    strongest = int(np.argmax(energy))
    total = energy.sum()
    assert energy[strongest] / total > 0.35
    # a separable-DWT HH band would respond equally to both diagonals: verify
    # some band carries <5% of the dominant one's energy (true selectivity)
    assert energy.min() < 0.05 * energy[strongest]


def test_dtcwt_magnitude_shift_invariance():
    """Magnitudes at levels >= 2 move far less under a 1-px shift than plain
    DWT (single-tree) coefficients do — the dual-tree raison d'etre."""
    x = _rng(3).normal(size=(1, 128, 128))
    # smooth it so level-2/3 bands carry the energy
    from scipy.ndimage import gaussian_filter  # scipy is baked in
    x = gaussian_filter(x[0], 2.0)[None]
    xs = np.roll(x, 1, axis=2)
    out_a = dtcwt2d(jnp.asarray(x), levels=3)
    out_b = dtcwt2d(jnp.asarray(xs), levels=3)
    for lvl in (1, 2):
        ma = np.asarray(jnp.sqrt(out_a[lvl][0] ** 2 + out_a[lvl][1] ** 2))
        mb = np.asarray(jnp.sqrt(out_b[lvl][0] ** 2 + out_b[lvl][1] ** 2))
        rel = np.abs(ma - mb).mean() / (ma.mean() + 1e-12)
        # plain DWT detail magnitudes shift by ~50-100% relative; DTCWT ~10%
        assert rel < 0.2, (lvl, rel)


def test_level1_analyticity():
    """Oriented complex subbands of a one-sided 2-D sinusoid concentrate
    energy in few bands; the conjugate-direction response stays small."""
    n = 64
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    img = np.cos(2 * np.pi * (0.2 * xx - 0.2 * yy))[None]
    out = dtcwt2d(jnp.asarray(img), levels=2)
    re, im = out[1]
    energy = np.asarray((re ** 2 + im ** 2).sum(axis=(0, 2, 3)))
    assert energy.max() / energy.sum() > 0.35


# ---------- CW-SSIM metric ---------------------------------------------------

def test_cw_ssim_identity_and_range():
    x = np.clip(_rng(1).normal(0.5, 0.2, size=(2, 32, 32, 3)), 0, 1).astype(np.float32)
    val = float(dtcwt_cw_ssim(jnp.asarray(x), jnp.asarray(x)))
    assert val > 0.999
    y = np.clip(_rng(2).normal(0.5, 0.2, size=(2, 32, 32, 3)), 0, 1).astype(np.float32)
    cross = float(dtcwt_cw_ssim(jnp.asarray(x), jnp.asarray(y)))
    assert 0.0 <= cross < 0.9
    assert cross < val


def test_cw_ssim_shift_tolerance_beats_ssim():
    """CW-SSIM is designed to forgive small geometric shifts that crater plain
    SSIM (the reason the reference reports it at all)."""
    from breaching_tpu.analysis import metrics as M
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(_rng(7).normal(0.5, 0.25, size=(48, 48)), 1.5)
    img = np.clip(img, 0, 1)
    shifted = np.roll(img, 3, axis=1)
    a = jnp.asarray(img[None, :, :, None].astype(np.float32))
    b = jnp.asarray(shifted[None, :, :, None].astype(np.float32))
    cw = float(dtcwt_cw_ssim(a, b))
    plain = float(M.ssim(a, b))
    # measured: cw ~0.57 vs ssim ~0.39 on this textured input
    assert cw > plain + 0.15
    assert cw > 0.5


def test_cw_ssim_golden_values():
    """Regression goldens (float32 CPU). Deterministic inputs."""
    rng = np.random.default_rng(42)
    x = np.clip(rng.normal(0.5, 0.2, size=(1, 32, 32, 3)), 0, 1).astype(np.float32)
    noise = rng.normal(0, 0.05, size=x.shape).astype(np.float32)
    y = np.clip(x + noise, 0, 1)
    val = float(dtcwt_cw_ssim(jnp.asarray(x), jnp.asarray(y)))
    assert val == pytest.approx(0.9508, abs=2e-3)


def test_report_emits_cw_ssim():
    """report() must now emit both cw_ssim (DTCWT) and gabor_cw_ssim keys."""
    import inspect
    from breaching_tpu.analysis import analysis
    src = inspect.getsource(analysis._run_vision_metrics)
    assert "cw_ssim=float(dtcwt_cw_ssim" in src
    assert "gabor_cw_ssim=" in src
