"""Vision Transformer in flax, with the APRIL-modified first block.

Capability parity with the reference's timm-based ViTs
(reference: breaching/cases/models/model_preparation.py:215-235, ModifiedBlock
:525-536). The "april" variants drop norm1 and both residual connections in
block 0, which makes the closed-form APRIL inversion exact: the token embedding z
feeds the first attention directly, so grad(pos_embed) and the block-0 qkv weight
gradients determine z up to a least-squares solve
(see breaching_tpu/attacks/analytic_attack.py AprilAttacker).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        qkv = nn.Dense(3 * D, name="qkv")(x)                      # fused qkv — APRIL reads this
        q, k, v = jnp.split(qkv, 3, axis=-1)
        head_dim = D // self.num_heads
        reshape = lambda t: t.reshape(B, T, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        q, k, v = reshape(q), reshape(k), reshape(v)
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(head_dim), axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, name="proj")(out)


class MLP(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        # exact (erf) GELU: timm/torch use the exact form, and converted
        # checkpoints (tools/convert_checkpoint.py) must match forward-for-forward
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2")(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    april_modified: bool = False

    @nn.compact
    def __call__(self, x):
        if self.april_modified:
            # reference ModifiedBlock: no norm1, no residual connections
            x = Attention(self.dim, self.num_heads, name="attn")(x)
            return MLP(self.dim, self.dim * self.mlp_ratio, name="mlp")(
                nn.LayerNorm(name="norm2")(x))
        y = Attention(self.dim, self.num_heads, name="attn")(nn.LayerNorm(name="norm1")(x))
        x = x + y
        y = MLP(self.dim, self.dim * self.mlp_ratio, name="mlp")(nn.LayerNorm(name="norm2")(x))
        return x + y


class VisionTransformer(nn.Module):
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    num_classes: int = 1000
    april_modified: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        patches = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                          strides=(self.patch_size, self.patch_size),
                          padding="VALID", name="patch_embed")(x)
        T = (H // self.patch_size) * (W // self.patch_size)
        tokens = patches.reshape(B, T, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        tokens = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), tokens], axis=1)
        pos = self.param("pos_embed",
                         nn.initializers.normal(stddev=0.02), (1, T + 1, self.dim))
        x = tokens + pos
        for i in range(self.depth):
            x = Block(self.dim, self.num_heads,
                      april_modified=self.april_modified and i == 0,
                      name=f"block{i}")(x)
        x = nn.LayerNorm(name="norm")(x)
        feats = x[:, 0]
        self.sow("intermediates", "features", feats)
        return nn.Dense(self.num_classes, name="head")(feats)


def build_vit(name: str, classes: int):
    lname = name.lower()
    april = "april" in lname
    if "small" in lname:
        return VisionTransformer(dim=384, depth=12, num_heads=6,
                                 num_classes=classes, april_modified=april)
    return VisionTransformer(dim=768, depth=12, num_heads=12,
                             num_classes=classes, april_modified=april)


def vit_april_refs(tree):
    """Pytree paths the APRIL attack needs (weights or their gradients)."""
    return dict(
        qkv_kernel=tree["block0"]["attn"]["qkv"]["kernel"],     # (D, 3D)
        pos_embed=tree["pos_embed"],                             # (1, T+1, D)
        patch_kernel=tree["patch_embed"]["kernel"].reshape(-1, tree["patch_embed"]["kernel"].shape[-1]),
        patch_bias=tree["patch_embed"]["bias"],
    )


def vit_april_retile(patches, patch_size=16):
    """Reassemble (P*P*C, T-1) patch pixels into an (H, W, C) image
    (reference: recover_patch, analytic_attack.py:852-866). The flax patch conv
    kernel layout is (ph, pw, C, D), so each patch column reshapes directly."""
    num_patches = patches.shape[1]
    grid = int(np.sqrt(num_patches))
    c = patches.shape[0] // (patch_size * patch_size)
    tiles = patches.T.reshape(grid, grid, patch_size, patch_size, c)
    return tiles.transpose(0, 2, 1, 3, 4).reshape(grid * patch_size, grid * patch_size, c)
