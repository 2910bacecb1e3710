"""ANN spatiotemporal Swin-3D transformer (v1 and v2 window attention).

Features flow channels-last [B, D, H, W, C]; windows are [B*nW, N, C].
Attention runs as one batched einsum over all windows -> large MXU matmuls.

Parity targets:
- v1 (softmax attention + learned relative-position-bias table):
  /root/reference/models/STSwinNet/STswin_transformer.py:83-167
- v2 (cosine attention + learned logit_scale + continuous position bias MLP):
  /root/reference/models/STSwinNet/swin_transformer3D_v2.py:87-223
- blocks/stages: swin_transformer3D_v2.py:226-540 (LayerNorm, drop-path on
  both branches), PatchMerging (:357-392, norm THEN reduction).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import windows as W
from .common import trunc_normal_02
from .spiking_layers import drop_path

_dense_init = trunc_normal_02


def _dense(features, use_bias, name):
    return nn.Dense(features, use_bias=use_bias, kernel_init=_dense_init,
                    name=name)


class WindowAttention3D(nn.Module):
    """Window attention on [B_, N, C]; version selects v1/v2 math."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    version: str = "swinv1"
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    pretrained_window_size: Tuple[int, int, int] = (0, 0, 0)

    @nn.compact
    def __call__(self, x, mask=None):
        B_, N, C = x.shape
        nh, hd = self.num_heads, C // self.num_heads
        qkv = _dense(3 * self.dim, self.qkv_bias, "qkv")(x)
        qkv = qkv.reshape(B_, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B_, nh, N, hd]

        if self.version == "swinv1":
            scale = self.qk_scale or hd ** -0.5
            attn = (q * scale) @ k.transpose(0, 1, 3, 2)
            table = self.param(
                "relative_position_bias_table", trunc_normal_02,
                ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1)
                 * (2 * self.window_size[2] - 1), nh))
            rel_idx = W.relative_position_index(self.window_size)
            bias = table[rel_idx[:N, :N].reshape(-1)].reshape(N, N, nh)
            attn = attn + bias.transpose(2, 0, 1)[None]
        else:  # swinv2: cosine attention
            # smooth normalization (eps inside the rsqrt): F.normalize's
            # clamped norm has a NaN gradient at exactly-zero vectors
            qn = q * jax.lax.rsqrt((q * q).sum(-1, keepdims=True) + 1e-12)
            kn = k * jax.lax.rsqrt((k * k).sum(-1, keepdims=True) + 1e-12)
            attn = qn @ kn.transpose(0, 1, 3, 2)
            logit_scale = self.param("logit_scale",
                                     nn.initializers.constant(math.log(10.0)),
                                     (nh, 1, 1))
            attn = attn * jnp.exp(jnp.clip(logit_scale, None, math.log(100.0)))
            coords = jnp.asarray(W.relative_coords_table(
                self.window_size, self.pretrained_window_size))
            h = nn.Dense(512, use_bias=True, kernel_init=_dense_init,
                         name="cpb_fc1")(coords)
            cpb = nn.Dense(nh, use_bias=False, kernel_init=_dense_init,
                           name="cpb_fc2")(nn.relu(h)).reshape(-1, nh)
            rel_idx = W.relative_position_index(self.window_size)
            Nw = int(np.prod(self.window_size))
            bias = cpb[rel_idx.reshape(-1)].reshape(Nw, Nw, nh)
            attn = attn + 16.0 * nn.sigmoid(bias.transpose(2, 0, 1))[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N) + mask[None, :, None]
            attn = attn.reshape(-1, nh, N, N)
        attn = nn.softmax(attn, axis=-1)

        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        out = _dense(self.dim, True, "proj")(out)
        return out, attn


class Mlp(nn.Module):
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        x = _dense(self.hidden_dim, True, "fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = _dense(self.dim, True, "fc2")(x)
        return x


class SwinBlock3D(nn.Module):
    """LN -> W-MSA (+ drop-path residual) -> LN -> MLP (+ drop-path
    residual) on [B, D, H, W, C]."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    version: str = "swinv1"
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    pretrained_window_size: Tuple[int, int, int] = (0, 0, 0)
    drop_path_rate: float = 0.0

    def _part1(self, x, mask_matrix, train, return_attention=False):
        B, D, H, Wd, C = x.shape
        window_size, shift_size = W.get_window_size(
            (D, H, Wd), self.window_size, self.shift_size)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x, _ = W.pad_to_windows(x, window_size)
        _, Dp, Hp, Wp, _ = x.shape
        if any(s > 0 for s in shift_size):
            shifted = jnp.roll(x, (-shift_size[0], -shift_size[1],
                                   -shift_size[2]), axis=(1, 2, 3))
            attn_mask = mask_matrix
        else:
            shifted = x
            attn_mask = None
        x_windows = W.window_partition(shifted, window_size)
        attn_windows, attn_score = WindowAttention3D(
            self.dim, window_size, self.num_heads, version=self.version,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            pretrained_window_size=self.pretrained_window_size,
            name="attn")(x_windows, attn_mask)
        if return_attention:
            return attn_score
        shifted = W.window_reverse(attn_windows, window_size, B, Dp, Hp, Wp)
        if any(s > 0 for s in shift_size):
            x = jnp.roll(shifted, shift_size, axis=(1, 2, 3))
        else:
            x = shifted
        return x[:, :D, :H, :Wd, :]

    @nn.compact
    def __call__(self, x, mask_matrix, train: bool = False,
                 return_attention: bool = False):
        shortcut = x
        y = self._part1(x, mask_matrix, train, return_attention)
        if return_attention:
            return y

        def dp(z):
            if self.drop_path_rate > 0.0 and train:
                return drop_path(z, self.drop_path_rate, deterministic=False,
                                 rng=self.make_rng("droppath"), batch_axis=0)
            return z

        x = shortcut + dp(y)
        y = Mlp(self.dim, int(self.dim * self.mlp_ratio),
                name="mlp")(nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        return x + dp(y)


class PatchMerging(nn.Module):
    """2x2 space-to-channel -> LN(4C) -> Linear 4C -> 2C."""

    dim: int

    @nn.compact
    def __call__(self, x):
        B, D, H, Wd, C = x.shape
        if H % 2 or Wd % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, Wd % 2), (0, 0)))
        x = jnp.concatenate([x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                             x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]],
                            axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return _dense(2 * self.dim, False, "reduction")(x)


class SwinStage(nn.Module):
    """depth x blocks (alternating shift) + optional PatchMerging.
    Returns (downsampled, pre-merge)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    mlp_ratio: float = 4.0
    version: str = "swinv1"
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    pretrained_window_size: Tuple[int, int, int] = (0, 0, 0)
    drop_path_rates: Tuple[float, ...] = ()
    downsample: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, D, H, Wd, C = x.shape
        shift = tuple(w // 2 for w in self.window_size)
        window_size, shift_size = W.get_window_size((D, H, Wd),
                                                    self.window_size, shift)
        Dp = -(-D // window_size[0]) * window_size[0]
        Hp = -(-H // window_size[1]) * window_size[1]
        Wp = -(-Wd // window_size[2]) * window_size[2]
        mask = W.compute_mask(Dp, Hp, Wp, window_size, shift_size)
        for i in range(self.depth):
            dpr = (self.drop_path_rates[i]
                   if i < len(self.drop_path_rates) else 0.0)
            x = SwinBlock3D(self.dim, self.num_heads,
                            window_size=self.window_size,
                            shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                            mlp_ratio=self.mlp_ratio, version=self.version,
                            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                            pretrained_window_size=self.pretrained_window_size,
                            drop_path_rate=dpr,
                            name=f"block{i}")(x, mask, train)
        pre_merge = x
        if self.downsample:
            x = PatchMerging(self.dim, name="downsample")(x)
        return x, pre_merge
