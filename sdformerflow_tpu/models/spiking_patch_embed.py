"""Spiking patch-embedding front-ends: event voxels -> [T, B, H', W', C] spikes.

Input contract (matching the reference drivers): ``[B, bins, 2, H, W]``
per-polarity voxel grids. Two regroupings turn the bin/polarity axes into an
SNN time axis:

- ``sfn_regroup``: channel i <- polarity i%2, bins (i//2)*T..(i//2+1)*T as the
  time axis ("spike-flow-net" 2/4-channel frames). Parity:
  /root/reference/models/STSwinNet_SNN/Spiking_modules.py:1139-1154.
- ``chunk_regroup``: flatten (bins, 2) and chunk into T equal channel groups
  ("nearest bins as channels"). Parity: Spiking_modules.py:1285-1293.

Variants mirror Spiking_modules.py:975-1837; the flagship
``MS_PED_Spiking_PatchEmbed_Conv_sfn`` (en4 config) is head -> MS conv /2 ->
2x MS resblocks -> PED projection /2.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import SpikingConfig, xavier_uniform
from .spiking_layers import (MSSpikingConvEncoderLayer, SpikingConvEncoderLayer,
                             SpikingEmbeddingLayer, SpikingNeuron, SpikingNorm,
                             SpikingPEDLayer, SpikingResidualStack,
                             norm_is_folded)
from ..ops.s2d import s2d_kernel_s1, s2d_kernel_s2, space_to_depth, tile4


def sfn_regroup(x, num_steps: int):
    """[B, bins, 2, H, W] -> [T, B, H, W, num_ch] with
    num_ch = 2 * bins // num_steps."""
    B, bins, P, H, Wd = x.shape
    num_ch = bins * 2 // num_steps
    chans = []
    for i in range(num_ch):
        start = (i // 2) * num_steps
        chans.append(x[:, start:start + num_steps, i % 2])  # [B, T, H, W]
    out = jnp.stack(chans, axis=-1)  # [B, T, H, W, num_ch]
    return out.transpose(1, 0, 2, 3, 4)


def chunk_regroup(x, num_steps: int):
    """[B, bins, 2, H, W] -> [T, B, H, W, 2*bins//T], consecutive
    (bin, polarity) pairs as channels."""
    B, bins, P, H, Wd = x.shape
    x = x.reshape(B, bins * P, H, Wd)
    x = x.reshape(B, num_steps, bins * P // num_steps, H, Wd)
    return x.transpose(1, 0, 3, 4, 2)


class SpikingPatchEmbedLocal(nn.Module):
    """Distinct "Local" embed: full-width head at stride 1 -> 4 resblocks ->
    projection at the full spatial patch stride (no intermediate /2 conv).
    Parity: Spiking_PatchEmbedLocal (Spiking_modules.py:975-1063) — head
    width ``in_chans // (num_steps - 1)`` (:991-999), 4 residual blocks with
    ADD joins (:1001-1018), spiking projection stride ``patch_size[2:]``
    (:1021-1023), patches_resolution = img_size // patch_size[2:] (:982).

    The reference applies no input regroup before the head; its raw
    ``[B, bins, 2, H, W]`` layout only type-checks because multi-step conv
    flattens the leading two axes. Here the bins/polarity axes are chunked
    onto the time axis with exactly the reference head width (for the
    standard bins == num_steps configs ``in_chans // (num_steps - 1)``
    equals ``2 * bins // num_steps``, so the parameter shapes match).

    ``spiking_proj=False`` selects the reference's plain-conv projection
    branch; note that branch is unreachable in the reference (it reads the
    commented-out ``self.num_blocks`` attribute, :1048 -> NameError, and the
    backbone always passes spiking_proj=True, :1177-1178). Implemented here
    as the evident intent: one shared conv applied per time step.
    """

    img_size: Tuple[int, int]
    patch_size: Tuple[int, ...] = (1, 1, 2, 2)
    in_chans: int = 10
    embed_dim: int = 96
    cfg: SpikingConfig = SpikingConfig()
    use_ms: bool = False
    num_res: int = 4
    spiking_proj: bool = True

    @property
    def patches_resolution(self):
        return (self.img_size[0] // self.patch_size[-2],
                self.img_size[1] // self.patch_size[-1])

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[:, :self.in_chans]
        T = self.cfg.num_steps
        head_in = max(self.in_chans * 2 // max(T - 1, 1), 1)
        B, bins, P, H, Wd = x.shape
        # chunk (bin, polarity) pairs onto T steps at the reference head width
        flat = x.reshape(B, bins * P, H, Wd)[:, :T * head_in]
        xt = flat.reshape(B, T, head_in, H, Wd).transpose(1, 0, 3, 4, 2)
        if self.use_ms:
            xt = MSSpikingConvEncoderLayer(self.embed_dim, self.cfg, 3, 1, 1,
                                           first_layer=True,
                                           name="head")(xt, train)
        else:
            xt = SpikingConvEncoderLayer(self.embed_dim, self.cfg, 3, 1, 1,
                                         name="head")(xt, train)
        xt = SpikingResidualStack(self.embed_dim, self.cfg, self.num_res,
                                  use_ms=self.use_ms,
                                  name="residual_encoding")(xt, train)
        if self.spiking_proj:
            xt = SpikingEmbeddingLayer(self.embed_dim, self.cfg,
                                       stride=tuple(self.patch_size[-2:]),
                                       use_ms=self.use_ms,
                                       name="proj")(xt, train)
        else:
            proj = nn.Conv(self.embed_dim, (3, 3),
                           strides=tuple(self.patch_size[-2:]),
                           padding=((1, 1), (1, 1)), name="proj")
            xt = jnp.stack([proj(xt[i]) for i in range(T)], axis=0)
        return xt


class SpikingPatchEmbedConvSfn(nn.Module):
    """sfn regroup -> SEW head -> (MS|SEW) conv /2 -> resblocks -> embedding
    projection /patch. Parity: Spiking_PatchEmbed_Conv_sfn and its MS variant
    (Spiking_modules.py:1523-1708)."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, ...] = (1, 1, 2, 2)
    in_chans: int = 10
    embed_dim: int = 96
    cfg: SpikingConfig = SpikingConfig()
    use_ms: bool = False
    num_res: int = 2

    @property
    def patches_resolution(self):
        return (self.img_size[0] // self.patch_size[-2] // 2,
                self.img_size[1] // self.patch_size[-1] // 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[:, :self.in_chans]
        x = sfn_regroup(x, self.cfg.num_steps)
        x = SpikingConvEncoderLayer(self.embed_dim // 2, self.cfg, 3, 1, 1,
                                    name="head")(x, train)
        if self.use_ms:
            x = MSSpikingConvEncoderLayer(self.embed_dim, self.cfg, 3, 2, 1,
                                          first_layer=True,
                                          name="conv")(x, train)
        else:
            x = SpikingConvEncoderLayer(self.embed_dim, self.cfg, 3, 2, 1,
                                        name="conv")(x, train)
        x = SpikingResidualStack(self.embed_dim, self.cfg, self.num_res,
                                 use_ms=self.use_ms,
                                 name="residual_encoding")(x, train)
        x = SpikingEmbeddingLayer(self.embed_dim, self.cfg,
                                  stride=tuple(self.patch_size[-2:]),
                                  use_ms=self.use_ms, name="proj")(x, train)
        return x


class _S2DExitConvLayer(nn.Module):
    """Block-space exit of the embed's stride-2 MS conv (cfg.s2d_embed):
    a 2x2 stride-1 conv with asymmetric (1,0) padding consuming the s2d
    tensor and emitting the half-resolution output in NORMAL layout — the
    exact image of conv2d(k=3, s=2, p=1) under s2d_kernel_s2 (ops/s2d.py).
    Param paths (conv/conv, conv/norm) match MSSpikingConvEncoderLayer so
    s2d_embed_variables only rearranges leaves."""

    out_channels: int
    cfg: SpikingConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        x = nn.Conv(self.out_channels, (2, 2), strides=(1, 1),
                    padding=((1, 0), (1, 0)),
                    use_bias=norm is None or folded,
                    kernel_init=xavier_uniform, name="conv")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.out_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm")(x, train)
        return x


class _S2DConv(nn.Module):
    """Conv with REFERENCE-SHAPED kernel ``[3,3,ci,co]`` expanded to block
    space at apply time (cfg.s2d_train). ``kind='s1'`` applies the
    s2d_kernel_s1 image (stride-1 SAME in block space, block-space output);
    ``kind='s2'`` applies the s2d_kernel_s2 image (2x2 stride-1 conv with
    (1,0) asymmetric padding, NORMAL half-resolution output). The expansion
    is a differentiable scatter of slices, so autodiff yields exactly the
    reference kernel's gradient (each original tap accumulates its 4 block
    placements). Param path/name/init match ``conv2d`` so the variable tree
    is identical to the base model's."""

    in_channels: int
    out_channels: int
    kind: str  # "s1" | "s2"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        # explicit f32 param dtype mirrors nn.Conv's param_dtype: under
        # enable_x64 an unspecified dtype would draw DIFFERENT f64 values
        # from the same key, breaking init equality with the base model
        w = self.param("kernel", xavier_uniform,
                       (3, 3, self.in_channels, self.out_channels),
                       jnp.float32)
        if self.kind == "s1":
            wp, pad = s2d_kernel_s1(w), ((1, 1), (1, 1))
        elif self.kind == "s2":
            wp, pad = s2d_kernel_s2(w), ((1, 0), (1, 0))
        else:
            raise ValueError(f"unknown s2d conv kind {self.kind!r}")
        cdt = jnp.promote_types(x.dtype, wp.dtype)
        lead = x.shape[:-3]
        xr = x.reshape((-1,) + x.shape[-3:]).astype(cdt)
        y = jax.lax.conv_general_dilated(
            xr, wp.astype(cdt), window_strides=(1, 1), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_channels,), jnp.float32)
            b = tile4(b) if self.kind == "s1" else b
            y = y + b.astype(cdt)
        return y.reshape(lead + y.shape[-3:])


class _S2DBlockBatchNorm(nn.Module):
    """TorchBatchNorm over a BLOCK-SPACE tensor ``[..., 4C]`` with
    REFERENCE-SHAPED per-channel statistics ``[C]``.

    Train mode reduces channel c's moments over ALL 4 block positions jointly
    (reshape the lane axis to (4, C) and reduce every axis but C) — the same
    population the reference's per-channel BN reduces at full resolution, so
    batch mean/var and the torch-convention running-stat updates (unbiased
    var, ``r <- (1-m) r + m s``) match the base TorchBatchNorm exactly (up to
    summation order). Eval broadcasts the running stats over the block axis.
    Stat/param names match TorchBatchNorm for tree compatibility."""

    momentum: float = 0.1
    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        C = x.shape[-1] // 4
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (C,))
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (C,))
        scale = self.param("scale", self.scale_init, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        cdt = jnp.promote_types(x.dtype, jnp.float32)
        xb = x.astype(cdt).reshape(x.shape[:-1] + (4, C))
        if use_running_average:
            mean = ra_mean.value.astype(cdt)
            var = ra_var.value.astype(cdt)
        else:
            axes = tuple(range(xb.ndim - 1))  # includes the block axis
            mean = xb.mean(axis=axes)
            var = (jnp.abs(xb - mean) ** 2).mean(axis=axes)  # biased
            if not self.is_initializing():
                n = x.size / C  # full per-channel population (4 blocks)
                unbiased = var * (n / max(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = ((1 - m) * ra_mean.value.astype(cdt)
                                 + m * mean)
                ra_var.value = ((1 - m) * ra_var.value.astype(cdt)
                                + m * unbiased)
        y = (xb - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(cdt) + bias.astype(cdt)
        return y.reshape(x.shape).astype(x.dtype)


class _S2DTrainHeadLayer(nn.Module):
    """Block-space SEW head (conv -> norm -> spike) with reference-shaped
    params (cfg.s2d_train twin of SpikingConvEncoderLayer(name='head'))."""

    in_channels: int
    out_channels: int
    cfg: SpikingConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        x = _S2DConv(self.in_channels, self.out_channels, "s1",
                     use_bias=norm is None or folded, name="conv")(x)
        if norm is not None and not folded:
            x = _S2DSpikingNorm(self.cfg, name="norm")(x, train)
        return SpikingNeuron(self.cfg, name="sn")(x)


class _S2DSpikingNorm(nn.Module):
    """SpikingNorm twin for block-space tensors: BN/TDBN only (per-channel
    batch statistics are the only norms the block re-reduction preserves —
    matching the s2d_embed constraint)."""

    cfg: SpikingConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        if norm == "BN":
            return _S2DBlockBatchNorm(name="BatchNorm_0")(x, not train)
        if norm == "TDBN":
            return _S2DBlockBatchNorm(
                name="BatchNorm_0",
                scale_init=nn.initializers.constant(self.cfg.v_th))(
                    x, not train)
        raise ValueError("cfg.s2d_train requires a per-channel BN embed "
                         f"(BN/TDBN), got {norm!r}")


class _S2DTrainExitLayer(nn.Module):
    """Block-space exit of the stride-2 MS conv with reference-shaped params
    (cfg.s2d_train twin of MSSpikingConvEncoderLayer(first_layer=True,
    name='conv')). Output is NORMAL half-resolution layout, so its norm is
    the standard per-channel SpikingNorm."""

    in_channels: int
    out_channels: int
    cfg: SpikingConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = self.cfg.spike_norm
        folded = norm_is_folded(norm, self.cfg)
        x = _S2DConv(self.in_channels, self.out_channels, "s2",
                     use_bias=norm is None or folded, name="conv")(x)
        if norm is not None and not folded:
            x = SpikingNorm(self.out_channels, self.cfg.num_steps, norm,
                            self.cfg.v_th, name="norm")(x, train)
        return x


class MSPEDSpikingPatchEmbedConvSfn(nn.Module):
    """Flagship (en4) embed: sfn regroup -> SEW head -> MS conv /2 ->
    2x MS resblocks -> PED projection /2. Parity:
    MS_PED_Spiking_PatchEmbed_Conv_sfn (Spiking_modules.py:1710-1837)."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, ...] = (1, 1, 2, 2)
    in_chans: int = 10
    embed_dim: int = 96
    cfg: SpikingConfig = SpikingConfig()
    num_res: int = 2

    @property
    def patches_resolution(self):
        return (self.img_size[0] // self.patch_size[-2] // 2,
                self.img_size[1] // self.patch_size[-1] // 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[:, :self.in_chans]
        x = sfn_regroup(x, self.cfg.num_steps)
        if self.cfg.s2d_train:
            # Train-capable exact block-space re-expression: parameters stay
            # REFERENCE-SHAPED (expanded inside apply, ops/s2d.py), BN
            # statistics are re-reduced across the 4 equal-count block
            # positions, so the variable tree AND the math match the base
            # model in both modes — flip the flag on a cloned model and
            # reuse the same variables (no s2d_embed_variables transform).
            if self.cfg.s2d_embed:
                raise ValueError("cfg.s2d_train and cfg.s2d_embed are "
                                 "mutually exclusive re-expressions")
            ci = x.shape[-1]
            x = space_to_depth(x)
            x = _S2DTrainHeadLayer(ci, self.embed_dim // 2, self.cfg,
                                   name="head")(x, train)
            x = _S2DTrainExitLayer(self.embed_dim // 2, self.embed_dim,
                                   self.cfg, name="conv")(x, train)
        elif self.cfg.s2d_embed:
            # Inference-only exact re-expression (ops/s2d.py): the
            # full-resolution segment runs in 2x2 block space with 4x
            # channels at half resolution; variables must come from
            # training.s2d_embed.s2d_embed_variables. Spike/PSN commute
            # with the pixel relabeling; eval-mode BN is a per-channel
            # affine whose stats the transform tiles by 4.
            if train:
                raise ValueError("cfg.s2d_embed is inference-only (train-mode"
                                 " BN statistics would be per-block-channel)")
            if self.cfg.spike_norm not in (None, "BN", "TDBN"):
                raise ValueError("cfg.s2d_embed requires a running-stats BN"
                                 f" embed, got {self.cfg.spike_norm!r}")
            x = space_to_depth(x)
            x = SpikingConvEncoderLayer(4 * (self.embed_dim // 2), self.cfg,
                                        3, 1, 1, name="head")(x, train)
            x = _S2DExitConvLayer(self.embed_dim, self.cfg,
                                  name="conv")(x, train)
        else:
            x = SpikingConvEncoderLayer(self.embed_dim // 2, self.cfg, 3, 1, 1,
                                        name="head")(x, train)
            x = MSSpikingConvEncoderLayer(self.embed_dim, self.cfg, 3, 2, 1,
                                          first_layer=True, name="conv")(x, train)
        x = SpikingResidualStack(self.embed_dim, self.cfg, self.num_res,
                                 use_ms=True,
                                 name="residual_encoding")(x, train)
        x = SpikingPEDLayer(self.embed_dim, self.cfg,
                            stride=tuple(self.patch_size[-2:]),
                            name="proj")(x, train)
        return x


class SpikingPatchEmbedSfn(nn.Module):
    """sfn regroup -> head (stride 1, full embed_dim) -> resblocks ->
    embedding projection. Parity: Spiking_PatchEmbed_sfn / MS_ variant
    (Spiking_modules.py:1065-1198)."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, ...] = (1, 1, 2, 2)
    in_chans: int = 10
    embed_dim: int = 96
    cfg: SpikingConfig = SpikingConfig()
    use_ms: bool = False
    num_res: int = 2

    @property
    def patches_resolution(self):
        return (self.img_size[0] // self.patch_size[-2],
                self.img_size[1] // self.patch_size[-1])

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[:, :self.in_chans]
        x = sfn_regroup(x, self.cfg.num_steps)
        if self.use_ms:
            x = MSSpikingConvEncoderLayer(self.embed_dim, self.cfg, 3, 1, 1,
                                          first_layer=True,
                                          name="head")(x, train)
        else:
            x = SpikingConvEncoderLayer(self.embed_dim, self.cfg, 3, 1, 1,
                                        name="head")(x, train)
        x = SpikingResidualStack(self.embed_dim, self.cfg, self.num_res,
                                 use_ms=self.use_ms,
                                 name="residual_encoding")(x, train)
        x = SpikingEmbeddingLayer(self.embed_dim, self.cfg,
                                  stride=tuple(self.patch_size[-2:]),
                                  use_ms=self.use_ms, name="proj")(x, train)
        return x


class SpikingPatchEmbedConv(nn.Module):
    """chunk regroup variant of the conv embed ("nearest bins as channels").
    Parity: Spiking_PatchEmbed_Conv (Spiking_modules.py:1200-1330); the MS
    branch of the reference uses 4 resblocks."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, ...] = (1, 1, 2, 2)
    in_chans: int = 10
    embed_dim: int = 96
    cfg: SpikingConfig = SpikingConfig()
    use_ms: bool = False

    @property
    def patches_resolution(self):
        return (self.img_size[0] // self.patch_size[-2] // 2,
                self.img_size[1] // self.patch_size[-1] // 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[:, :self.in_chans]
        x = chunk_regroup(x, self.cfg.num_steps)
        x = SpikingConvEncoderLayer(self.embed_dim // 2, self.cfg, 3, 1, 1,
                                    name="head")(x, train)
        if self.use_ms:
            x = MSSpikingConvEncoderLayer(self.embed_dim, self.cfg, 3, 2, 1,
                                          first_layer=True,
                                          name="conv")(x, train)
            num_res = 4
        else:
            x = SpikingConvEncoderLayer(self.embed_dim, self.cfg, 3, 2, 1,
                                        name="conv")(x, train)
            num_res = 2
        x = SpikingResidualStack(self.embed_dim, self.cfg, num_res,
                                 use_ms=self.use_ms,
                                 name="residual_encoding")(x, train)
        x = SpikingEmbeddingLayer(self.embed_dim, self.cfg,
                                  stride=tuple(self.patch_size[-2:]),
                                  use_ms=self.use_ms, name="proj")(x, train)
        return x


class MSSpikingPatchEmbedConvLocal(nn.Module):
    """Per-temporal-block local embed: bins split into bins//T groups of
    [T, B, H, W, 2]; each group runs the head/conv/res/proj pipeline and the
    groups stack along the output time axis. Parity (modulo the reference's
    ambiguous output layout): MS_Spiking_PatchEmbed_Conv_Local
    (Spiking_modules.py:1332-1521)."""

    img_size: Tuple[int, int]
    patch_size: Tuple[int, ...] = (1, 1, 2, 2)
    in_chans: int = 10
    embed_dim: int = 96
    cfg: SpikingConfig = SpikingConfig()
    num_res: int = 2

    @property
    def patches_resolution(self):
        return (self.img_size[0] // self.patch_size[-2] // 2,
                self.img_size[1] // self.patch_size[-1] // 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[:, :self.in_chans]
        T = self.cfg.num_steps
        num_blocks = self.in_chans // T
        head = SpikingConvEncoderLayer(self.embed_dim // 2, self.cfg, 3, 1, 1,
                                       name="head")
        conv = MSSpikingConvEncoderLayer(self.embed_dim, self.cfg, 3, 2, 1,
                                         first_layer=True, name="conv")
        res = SpikingResidualStack(self.embed_dim, self.cfg, self.num_res,
                                   use_ms=True, name="residual_encoding")
        proj = SpikingEmbeddingLayer(self.embed_dim, self.cfg,
                                     stride=tuple(self.patch_size[-2:]),
                                     use_ms=True, name="proj")
        outs = []
        for i in range(num_blocks):
            xi = x[:, i * T:(i + 1) * T].transpose(1, 0, 3, 4, 2)  # T,B,H,W,2
            xi = proj(res(conv(head(xi, train), train), train), train)
            outs.append(xi.sum(axis=0))  # collapse inner T per block
        return jnp.stack(outs, axis=0)  # [num_blocks, B, H', W', C]
