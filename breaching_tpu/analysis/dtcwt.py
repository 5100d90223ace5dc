"""2-D Dual-Tree Complex Wavelet Transform (Kingsbury) and CW-SSIM in JAX.

The reference computes CW-SSIM on the complex highpass coefficients of a DTCWT
from pytorch_wavelets with ``biort="near_sym_b", qshift="qshift_b"``
(reference breaching/analysis/metrics.py:11-55). That package is torch-only,
so this module implements the transform natively: two real wavelet trees per
image axis whose wavelets form approximate Hilbert pairs, giving six oriented
complex subbands per level whose *magnitudes* are nearly shift-invariant — the
property plain DWTs (and the repo's Gabor fallback) lack.

Filter constants are Kingsbury's published banks, validated in
tests/test_dtcwt.py against their defining algebraic identities rather than
against a library: near_sym_b satisfies the biorthogonal perfect-reconstruction
halfband condition to ~2e-7, qshift_b is orthonormal to even shifts at ~1e-9
with sum sqrt(2) and quarter-sample group delay. The tree conventions
(h0b = reverse(h0a), h1a[n] = (-1)^n h0b[n]) were selected by measuring
analyticity directly: a bandpass sinusoid's complex envelope has <0.7% ripple
and negative-frequency energy leakage ~5e-5 at levels >= 2.

Implementation is the explicit four-tree form rather than the reference
library's interleaved polyphase arrays: after level 1 the four (y-tree,
x-tree) lowpass grids are separate arrays, each filtered with its own tree's
q-shift filters — identical mathematics, but shapes stay static and every
step is a plain strided convolution XLA maps onto the TPU conv units.

CW-SSIM itself is orientation-order and per-orientation-phase invariant (the
index sums x*conj(y) over orientations before taking magnitudes, so fixed
unitary conventions cancel between the two images), which is why matching the
reference's exact coefficient layout is not required for metric parity.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# --- Kingsbury near_sym_b level-1 biorthogonal pair (13, 19 taps) ----------
NEAR_SYM_B_H0O = np.array(
    [-0.0017581, 0.0, 0.0222656, -0.0468750, -0.0482422, 0.2968750,
     0.5554688, 0.2968750, -0.0482422, -0.0468750, 0.0222656, 0.0, -0.0017581],
    np.float64)
NEAR_SYM_B_H1O = np.array(
    [-0.0000706, 0.0, 0.0013419, -0.0018834, -0.0071568, 0.0238560,
     0.0556431, -0.0516881, -0.2997576, 0.5594308, -0.2997576, -0.0516881,
     0.0556431, 0.0238560, -0.0071568, -0.0018834, 0.0013419, 0.0, -0.0000706],
    np.float64)

# --- Kingsbury qshift_b tree filters (14 taps, levels >= 2) -----------------
QSHIFT_B_H0A = np.array(
    [0.00325314, -0.00388321, 0.03466035, -0.03887280,
     -0.11720389, 0.27529538, 0.75614564, 0.56881042,
     0.01186609, -0.10671180, 0.02382538, 0.01702522,
     -0.00543948, -0.00455690], np.float64)
QSHIFT_B_H0B = QSHIFT_B_H0A[::-1].copy()
_ALT = (-1.0) ** np.arange(len(QSHIFT_B_H0A))
QSHIFT_B_H1A = _ALT * QSHIFT_B_H0B
QSHIFT_B_H1B = QSHIFT_B_H1A[::-1].copy()


def _corr_axis(x, h, axis: int, stride: int = 1):
    """Reflect-padded 'same' correlation of (N, H, W) along H or W, optionally
    decimating by `stride` (phase 0). One grouped conv per call — XLA lowers
    it onto the TPU convolution units."""
    h = jnp.asarray(h, x.dtype)
    L = h.shape[0]
    pl, pr = (L - 1) // 2, L // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (pl, pr)
    xp = jnp.pad(x, pad, mode="reflect")
    kernel = h.reshape((L, 1, 1, 1) if axis == 1 else (1, L, 1, 1))
    strides = (stride, 1) if axis == 1 else (1, stride)
    return jax.lax.conv_general_dilated(
        xp[..., None], kernel, strides, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]


def _even_pad(x):
    """Reflect-pad H/W to even sizes (the per-level rule pytorch_wavelets uses)."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw)), mode="reflect")
    return x


def _quads_to_complex(s00, s01, s10, s11):
    """Four (y-tree, x-tree) real subbands -> two oriented complex subbands.

    With u = tree_a + j*tree_b per axis: u(x)u(y) and u(x)conj(u(y)) give
    real/imag parts as sums/differences of the four tree combinations.
    Returns ((re1, im1), (re2, im2)), each scaled by 1/sqrt(2) so the pair
    preserves the energy of the four inputs.
    """
    s = 0.5 ** 0.5
    return ((s * (s00 - s11), s * (s01 + s10)),
            (s * (s00 + s11), s * (s01 - s10)))


def dtcwt2d(img, levels: int = 5):
    """Forward DTCWT of (N, H, W) arrays.

    Returns a list of `levels` tuples (re, im) with shape (N, 6, H_l, W_l):
    the six oriented complex subbands per level (complex dtypes are avoided —
    some TPU backends lack them — so real/imag are carried explicitly).
    """
    x = _even_pad(img)
    out = []

    # Level 1: undecimated near_sym filters; the four trees are the four
    # polyphase grids of each filtered output (tree b = one-sample delay =
    # half a sample at the decimated rate).
    lo_x = _corr_axis(x, NEAR_SYM_B_H0O, axis=2)
    hi_x = _corr_axis(x, NEAR_SYM_B_H1O, axis=2)
    bands = {
        "lh": _corr_axis(lo_x, NEAR_SYM_B_H1O, axis=1),
        "hl": _corr_axis(hi_x, NEAR_SYM_B_H0O, axis=1),
        "hh": _corr_axis(hi_x, NEAR_SYM_B_H1O, axis=1),
    }
    level = []
    for name in ("lh", "hl", "hh"):
        b = _even_pad(bands[name])
        quads = (b[:, 0::2, 0::2], b[:, 0::2, 1::2],
                 b[:, 1::2, 0::2], b[:, 1::2, 1::2])
        level.extend(_quads_to_complex(*quads))
    out.append((jnp.stack([re for re, _ in level], axis=1),
                jnp.stack([im for _, im in level], axis=1)))

    ll = _corr_axis(lo_x, NEAR_SYM_B_H0O, axis=1)
    ll = _even_pad(ll)
    # grids[p][q]: y-tree p, x-tree q (0 = tree a, 1 = tree b)
    grids = [[ll[:, 0::2, 0::2], ll[:, 0::2, 1::2]],
             [ll[:, 1::2, 0::2], ll[:, 1::2, 1::2]]]

    lo_f = (QSHIFT_B_H0A, QSHIFT_B_H0B)
    hi_f = (QSHIFT_B_H1A, QSHIFT_B_H1B)
    for _ in range(1, levels):
        sub = {"lh": [[None] * 2 for _ in range(2)],
               "hl": [[None] * 2 for _ in range(2)],
               "hh": [[None] * 2 for _ in range(2)]}
        new_grids = [[None] * 2 for _ in range(2)]
        for p in range(2):
            for q in range(2):
                g = _even_pad(grids[p][q])
                lo_xq = _corr_axis(g, lo_f[q], axis=2, stride=2)
                hi_xq = _corr_axis(g, hi_f[q], axis=2, stride=2)
                sub["lh"][p][q] = _corr_axis(lo_xq, hi_f[p], axis=1, stride=2)
                sub["hl"][p][q] = _corr_axis(hi_xq, lo_f[p], axis=1, stride=2)
                sub["hh"][p][q] = _corr_axis(hi_xq, hi_f[p], axis=1, stride=2)
                new_grids[p][q] = _corr_axis(lo_xq, lo_f[p], axis=1, stride=2)
        level = []
        for name in ("lh", "hl", "hh"):
            s = sub[name]
            level.extend(_quads_to_complex(s[0][0], s[0][1], s[1][0], s[1][1]))
        out.append((jnp.stack([re for re, _ in level], axis=1),
                    jnp.stack([im for _, im in level], axis=1)))
        grids = new_grids
    return out


def dtcwt_cw_ssim(rec, ref, scales: int = 5, K: float = 1e-6):
    """Complex-wavelet SSIM on DTCWT coefficients (reference metrics.py:11-55).

    rec, ref: (B, H, W, C) images. Per level: the pixelwise index
    (2|sum_o x conj(y)| + K) / (sum_o |x|^2 + sum_o |y|^2 + K), averaged over
    channels and pixels, then over levels. Returns the batch mean (the
    reference returns (mean, max); report() consumes the mean).
    """
    B, H, W, C = rec.shape
    # transform each channel independently, like the reference's (B, C, H, W)
    flat_rec = jnp.transpose(rec, (0, 3, 1, 2)).reshape(B * C, H, W)
    flat_ref = jnp.transpose(ref, (0, 3, 1, 2)).reshape(B * C, H, W)
    # don't request levels the image can't support
    usable = max(1, min(scales, int(np.floor(np.log2(max(min(H, W), 2)))) - 1))
    xs = dtcwt2d(flat_rec, levels=usable)
    ys = dtcwt2d(flat_ref, levels=usable)
    total = 0.0
    for (xr, xi), (yr, yi) in zip(xs, ys):
        conj_re = jnp.sum(xr * yr + xi * yi, axis=1)
        conj_im = jnp.sum(xi * yr - xr * yi, axis=1)
        num = 2.0 * jnp.sqrt(conj_re ** 2 + conj_im ** 2) + K
        den = jnp.sum(xr ** 2 + xi ** 2, axis=1) + jnp.sum(yr ** 2 + yi ** 2, axis=1) + K
        total = total + jnp.mean((num / den).reshape(B, -1), axis=1)
    per_image = total / usable
    return jnp.mean(per_image)
