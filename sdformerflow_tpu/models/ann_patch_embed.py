"""ANN patch embeddings: per-temporal-block conv heads + residual feature
generators + strided projection.

Input: ``[T, B, H, W, C=patch_t]`` time groups of voxel bins; output
``[B, D=T, H', W', embed_dim]``.

Parity targets: /root/reference/models/STSwinNet/PatchEmbed.py
(PatchEmbedLocal :135-212, PatchEmbedLocal_Conv :214-280,
PatchEmbedLocalGlobal :65-133, residual_feature_generator :6-21).

TPU note: the reference loops over temporal blocks with shared weights; here
the (T, B) axes are batched through one conv, so BN statistics inside the
residual blocks are computed jointly over all blocks rather than per block —
a deliberate deviation that keeps the MXU busy with one large conv.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .ann_layers import ResidualBlock
from .spiking_layers import conv2d


class ResidualFeatureGenerator(nn.Module):
    dim: int
    num_blocks: int = 4
    norm: Optional[str] = "BN"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            x = ResidualBlock(self.dim, 1, "relu", self.norm,
                              name=f"resblock{i + 1}")(x, train)
        return x


class PatchEmbedLocal(nn.Module):
    """head conv -> 4x residual blocks -> strided proj, per temporal block."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, ...] = (2, 4, 4)
    embed_dim: int = 96

    @property
    def patches_resolution(self):
        return (self.img_size[0] // self.patch_size[-2],
                self.img_size[1] // self.patch_size[-1])

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [T, B, H, W, patch_t]
        x = conv2d(self.embed_dim, 3, 1, name="head")(x)
        x = ResidualFeatureGenerator(self.embed_dim,
                                     name="residual_encoding")(x, train)
        x = nn.Conv(self.embed_dim, (3, 3),
                    strides=tuple(self.patch_size[-2:]),
                    padding=((1, 1), (1, 1)), name="proj")(x)
        return x.transpose(1, 0, 2, 3, 4)  # [B, D, H', W', C]


class PatchEmbedLocalConv(nn.Module):
    """Like PatchEmbedLocal with an extra stride-2 conv after the head."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, ...] = (2, 4, 4)
    embed_dim: int = 96

    @property
    def patches_resolution(self):
        return (self.img_size[0] // self.patch_size[-2] // 2,
                self.img_size[1] // self.patch_size[-1] // 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.embed_dim // 2, 3, 1, name="head")(x)
        x = conv2d(self.embed_dim, 3, 2, name="conv")(x)
        x = ResidualFeatureGenerator(self.embed_dim,
                                     name="residual_encoding")(x, train)
        x = nn.Conv(self.embed_dim, (3, 3),
                    strides=tuple(self.patch_size[-2:]),
                    padding=((1, 1), (1, 1)), name="proj")(x)
        return x.transpose(1, 0, 2, 3, 4)


class PatchEmbedLocalGlobal(nn.Module):
    """Half the embedding from per-block local features, half from a global
    head over all bins."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, ...] = (2, 4, 4)
    embed_dim: int = 96

    @property
    def patches_resolution(self):
        return (self.img_size[0] // self.patch_size[-2],
                self.img_size[1] // self.patch_size[-1])

    @nn.compact
    def __call__(self, x, train: bool = False):
        T, B, H, Wd, C = x.shape
        half = self.embed_dim // 2
        # global branch sees all T*C bins at once
        x_global = x.transpose(1, 2, 3, 0, 4).reshape(B, H, Wd, T * C)
        g = conv2d(half, 3, 1, name="global_head")(x_global)
        g = ResidualFeatureGenerator(half,
                                     name="global_residual_encoding")(g, train)
        g = nn.Conv(half, (3, 3), strides=tuple(self.patch_size[-2:]),
                    padding=((1, 1), (1, 1)), name="global_proj")(g)

        l = conv2d(half, 3, 1, name="head")(x)
        l = ResidualFeatureGenerator(half, name="residual_encoding")(l, train)
        l = nn.Conv(half, (3, 3), strides=tuple(self.patch_size[-2:]),
                    padding=((1, 1), (1, 1)), name="proj")(l)
        g = jnp.broadcast_to(g[None], (T,) + g.shape)
        out = jnp.concatenate([l, g], axis=-1)
        return out.transpose(1, 0, 2, 3, 4)


ANN_PATCH_EMBEDS = {
    "PatchEmbedLocal": PatchEmbedLocal,
    "PatchEmbedLocal_Conv": PatchEmbedLocalConv,
    "PatchEmbedLocalGlobal": PatchEmbedLocalGlobal,
}
