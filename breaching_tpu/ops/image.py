"""Pallas TPU kernels for image-space operations in the attack loop.

- fused_total_variation: dx/dy stencil + |.|^p + (+)^q + reduction in one VMEM
  pass per image tile (the XLA version materializes the diff tensors in HBM).
- box_project: the boxed projection max(min(x, hi), lo) as a single fused pass
  (applied every attack iteration to the whole candidate batch).

Both fall back to interpret mode off-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tv_kernel(img_ref, params_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((), jnp.float32)

    img = img_ref[:]  # (1, H, W, C) block
    inner = params_ref[0, 0]
    outer = params_ref[0, 1]
    eps = params_ref[0, 2]
    dx = jnp.concatenate([img[:, :, 1:, :] - img[:, :, :-1, :],
                          jnp.zeros_like(img[:, :, :1, :])], axis=2)
    dy = jnp.concatenate([img[:, 1:, :, :] - img[:, :-1, :, :],
                          jnp.zeros_like(img[:, :1, :, :])], axis=1)
    px = jnp.power(jnp.abs(dx) + eps, inner)
    py = jnp.power(jnp.abs(dy) + eps, inner)
    out_ref[0, 0] += jnp.sum(jnp.power(px + py, outer))


def fused_total_variation(images, inner_exp=1.0, outer_exp=1.0, eps=1e-8):
    """Mean anisotropic TV over an NHWC batch, one pass per image."""
    B = images.shape[0]
    params = jnp.asarray([[inner_exp, outer_exp, eps]], jnp.float32)
    total = pl.pallas_call(
        _tv_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, *images.shape[1:]), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3), lambda b: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_interpret(),
    )(images, params)
    return total[0, 0] / images.size


def _box_kernel(x_ref, lo_ref, hi_ref, out_ref):
    out_ref[:] = jnp.minimum(jnp.maximum(x_ref[:], lo_ref[:]), hi_ref[:])


def box_project(x, lo, hi):
    """Elementwise clamp of an NHWC batch against channelwise bounds."""
    lo_full = jnp.broadcast_to(lo, x.shape[-1:]).astype(x.dtype)
    hi_full = jnp.broadcast_to(hi, x.shape[-1:]).astype(x.dtype)
    flat = x.reshape(-1, x.shape[-1])
    lo2d = jnp.broadcast_to(lo_full, flat.shape)
    hi2d = jnp.broadcast_to(hi_full, flat.shape)
    out = pl.pallas_call(
        _box_kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(flat, lo2d, hi2d)
    return out.reshape(x.shape)
