"""Candidate initialization schemes (reference: breaching/attacks/base_attack.py:222-285).

All schemes are pure functions of a PRNG key, shapes are NHWC, and values live in
the normalized ("inside the network normalization") space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_candidate(key, init_type: str, data_shape, dm=None, ds=None, dtype=jnp.float32):
    """data_shape: (B, H, W, C) for vision, (B, T, D) for text embeddings.
    dm/ds: channelwise mean/std arrays for *-true inits."""
    if len(data_shape) != 4:  # text embeddings: only the basic schemes apply
        if init_type == "randn":
            return jax.random.normal(key, data_shape, dtype)
        if init_type == "randn-trunc":
            return jnp.clip(jax.random.normal(key, data_shape, dtype) * 0.1, -0.1, 0.1)
        if init_type == "rand":
            return jax.random.uniform(key, data_shape, dtype) * 2 - 1.0
        if init_type == "zeros":
            return jnp.zeros(data_shape, dtype)
        raise ValueError(f"Initialization {init_type} undefined for shape {data_shape}.")
    B, H, W, C = data_shape
    if init_type == "randn":
        return jax.random.normal(key, data_shape, dtype)
    if init_type == "randn-trunc":
        return jnp.clip(jax.random.normal(key, data_shape, dtype) * 0.1, -0.1, 0.1)
    if init_type == "rand":
        return jax.random.uniform(key, data_shape, dtype) * 2 - 1.0
    if init_type == "zeros":
        return jnp.zeros(data_shape, dtype)
    if any(color in init_type for color in ("red", "green", "blue", "dark", "light")):
        candidate = jnp.zeros(data_shape, dtype)
        if "light" in init_type:
            candidate = jnp.ones(data_shape, dtype)
        elif "dark" not in init_type:
            channel = 0 if "red" in init_type else 1 if "green" in init_type else 2
            candidate = candidate.at[..., channel].set(1.0)
        if "-true" in init_type and dm is not None:
            candidate = (candidate - dm) / ds
        return candidate
    if "patterned" in init_type or "wei" in init_type:
        width = int("".join(filter(str.isdigit, init_type)) or "4")
        if "rand" in init_type and "randn" not in init_type:
            seed = jax.random.uniform(key, (B, width, width, C), dtype) * 2 - 1
        else:
            seed = jax.random.normal(key, (B, width, width, C), dtype)
        reps_h = -(-H // width)
        reps_w = -(-W // width)
        return jnp.tile(seed, (1, reps_h, reps_w, 1))[:, :H, :W, :]
    raise ValueError(f"Unknown initialization scheme {init_type}.")
