"""Inversion-time differentiable augmentations.

TPU-native counterpart of reference breaching/attacks/auxiliaries/augmentations.py.
Every augmentation is a pure function of (images NHWC, PRNG key) so it composes
into the jitted attack scan; the grid-sampled RandomTransform is implemented as a
differentiable bilinear gather (XLA fuses it with the surrounding step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Jitter:
    """Random integer roll along H/W (reference: Jitter, augmentations.py:9-18)."""

    def __init__(self, lim=32, **kwargs):
        self.lim = int(lim)

    def __call__(self, x, key):
        k1, k2 = jax.random.split(key)
        off1 = jax.random.randint(k1, (), -self.lim, self.lim)
        off2 = jax.random.randint(k2, (), -self.lim, self.lim)
        return jnp.roll(x, (off1, off2), axis=(1, 2))

    def __repr__(self):
        return f"Jitter(lim={self.lim})"


class Focus:
    """Random crop of fixed size near the center (reference: Focus:20-32).

    Uses a dynamic-slice so the output shape stays static under jit."""

    def __init__(self, size=224, std=1.0, **kwargs):
        self.size = int(size)
        self.std = float(std)

    def __call__(self, img, key):
        h, w = img.shape[1:3]
        pert = (jax.random.uniform(key, (2,)) * 2 - 1) * self.std
        x0 = jnp.clip((pert[0] + h // 2 - self.size // 2).astype(jnp.int32), 0, h - self.size)
        y0 = jnp.clip((pert[1] + w // 2 - self.size // 2).astype(jnp.int32), 0, w - self.size)
        return jax.lax.dynamic_slice(
            img, (0, x0, y0, 0), (img.shape[0], self.size, self.size, img.shape[3]))

    def __repr__(self):
        return f"Focus(size={self.size}, std={self.std})"


class Zoom:
    """Bilinear upsample to a fixed size (reference: Zoom:34-41)."""

    def __init__(self, out_size=224, **kwargs):
        self.out_size = int(out_size)

    def __call__(self, img, key=None):
        B, _, _, C = img.shape
        return jax.image.resize(img, (B, self.out_size, self.out_size, C), "bilinear")

    def __repr__(self):
        return f"Zoom(out_size={self.out_size})"


class CenterZoom:
    """Center crop of fov x fov, zoomed to out_size (reference: CenterZoom:43-55)."""

    def __init__(self, initial_fov=32, out_size=224, **kwargs):
        self.fov = int(initial_fov)
        self.out_size = int(out_size)

    def __call__(self, img, key=None):
        B, h, w, C = img.shape
        h0, w0 = (h - self.fov) // 2, (w - self.fov) // 2
        crop = img[:, h0:h0 + self.fov, w0:w0 + self.fov, :]
        return jax.image.resize(crop, (B, self.out_size, self.out_size, C), "bilinear")

    def __repr__(self):
        return f"CenterZoom(fov={self.fov}, out_size={self.out_size})"


class Flip:
    """Horizontal flip with probability p (reference: Flip:58-67)."""

    def __init__(self, p=0.5, **kwargs):
        self.p = float(p)

    def __call__(self, x, key):
        do_flip = jax.random.uniform(key, ()) < self.p
        return jnp.where(do_flip, jnp.flip(x, axis=2), x)

    def __repr__(self):
        return f"Flip(p={self.p})"


class ColorJitter:
    """Per-image random channel scale/shift (reference: ColorJitter:70-88)."""

    def __init__(self, batch_size=1, shuffle_every=False, mean=0.0, std=1.0, **kwargs):
        self.mean = float(mean or 0.0)
        self.std = float(std or 1.0)

    def __call__(self, img, key):
        k1, k2 = jax.random.split(key)
        B, C = img.shape[0], img.shape[3]
        scale = jnp.exp(jax.random.normal(k1, (B, 1, 1, C)) * 0.1 * self.std)
        shift = jax.random.normal(k2, (B, 1, 1, C)) * 0.1 * self.std + self.mean
        return img * scale + shift

    def __repr__(self):
        return "ColorJitter()"


class MedianPool:
    """3x3 median filter with 'same' padding (reference: MedianPool2d:90-137)."""

    def __init__(self, kernel_size=3, stride=1, padding=0, same=True, **kwargs):
        self.k = int(kernel_size)

    def __call__(self, x, key=None):
        p = self.k // 2
        padded = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        patches = [padded[:, i:i + x.shape[1], j:j + x.shape[2], :]
                   for i in range(self.k) for j in range(self.k)]
        return jnp.median(jnp.stack(patches), axis=0)

    def __repr__(self):
        return f"MedianPool(k={self.k})"


class RandomTransform:
    """Differentiable random sub-pixel shift (+ optional flips) via bilinear
    resampling (reference: RandomTransform:139-196, grid_sample-based)."""

    def __init__(self, shift=8, fliplr=False, flipud=False, mode="bilinear",
                 padding="reflection", align=False, **kwargs):
        self.shift = float(shift)
        self.fliplr = bool(fliplr)
        self.flipud = bool(flipud)
        self.padding = padding

    def __call__(self, x, key):
        B, H, W, C = x.shape
        rand = jax.random.uniform(key, (B, 4))
        # per-image sub-pixel shifts
        dx = (rand[:, 0] - 0.5) * 2 * self.shift
        dy = (rand[:, 1] - 0.5) * 2 * self.shift

        rows = jnp.arange(H, dtype=x.dtype)[None, :] + dy[:, None]   # (B, H)
        cols = jnp.arange(W, dtype=x.dtype)[None, :] + dx[:, None]   # (B, W)
        if self.fliplr:
            cols = jnp.where(rand[:, 2, None] > 0.5, (W - 1) - cols, cols)
        if self.flipud:
            rows = jnp.where(rand[:, 3, None] > 0.5, (H - 1) - rows, rows)

        def wrap(coord, size):
            if self.padding == "circular":
                return coord % size
            reflected = jnp.abs(coord)
            reflected = jnp.where(reflected > size - 1, 2 * (size - 1) - reflected, reflected)
            return jnp.clip(reflected, 0, size - 1)

        rows, cols = wrap(rows, H), wrap(cols, W)
        r0, c0 = jnp.floor(rows), jnp.floor(cols)
        wr, wc = rows - r0, cols - c0                                 # (B, H), (B, W)
        r0i, c0i = r0.astype(jnp.int32), c0.astype(jnp.int32)
        if self.padding == "circular":
            r1i, c1i = (r0i + 1) % H, (c0i + 1) % W
        else:
            r1i, c1i = jnp.minimum(r0i + 1, H - 1), jnp.minimum(c0i + 1, W - 1)

        def sample_one(img, ri0, ri1, ci0, ci1, wwr, wwc):
            # bilinear gather: (H,) x (W,) index vectors per image
            wwc_ = wwc[None, :, None]
            wwr_ = wwr[:, None, None]
            top = img[ri0][:, ci0, :] * (1 - wwc_) + img[ri0][:, ci1, :] * wwc_
            bot = img[ri1][:, ci0, :] * (1 - wwc_) + img[ri1][:, ci1, :] * wwc_
            return top * (1 - wwr_) + bot * wwr_

        return jax.vmap(sample_one)(x, r0i, r1i, c0i, c1i, wr, wc)

    def __repr__(self):
        return f"RandomTransform(shift={self.shift}, padding={self.padding})"


class AntiAlias:
    """Binomial blur filter (reference: AntiAlias:198-226)."""

    def __init__(self, channels=3, width=5, stride=1, **kwargs):
        base = np.asarray({
            1: [1.0], 2: [1.0, 1.0], 3: [1.0, 2.0, 1.0], 4: [1.0, 3.0, 3.0, 1.0],
            5: [1.0, 4.0, 6.0, 4.0, 1.0], 6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
            7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0]}[int(width)])
        kern = base[:, None] * base[None, :]
        self.kernel = jnp.asarray(kern / kern.sum(), jnp.float32)
        self.width = int(width)
        self.stride = int(stride)

    def __call__(self, x, key=None):
        C = x.shape[-1]
        kernel = jnp.tile(self.kernel[:, :, None, None], (1, 1, 1, C))
        pad = self.width // 2
        return jax.lax.conv_general_dilated(
            x, kernel, (self.stride, self.stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)

    def __repr__(self):
        return f"AntiAlias(width={self.width})"


augmentation_lookup = dict(
    antialias=AntiAlias,
    continuous_shift=RandomTransform,
    colorjitter=ColorJitter,
    flip=Flip,
    zoom=Zoom,
    focus=Focus,
    discrete_shift=Jitter,
    median=MedianPool,
    centerzoom=CenterZoom,
)
