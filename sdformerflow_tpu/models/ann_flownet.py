"""ANN STTFlowNet: Swin-3D encoder + multi-res conv U-Net flow decoder.

Public contract (reference drivers): input signed voxel grid
``[B, num_bins, H, W]``; output ``{"flow": [coarse -> fine], "attn": None}``
with each map ``[B, 2, H, W]``.

Parity targets:
- SwinTransformer3D / SwinTransformer3D_v2 backbones:
  /root/reference/models/STSwinNet/STswin_transformer.py:413-628,
  swin_transformer3D_v2.py:542-791
- STT_encoder with per-stage per-timestep 1x1 projections:
  /root/reference/models/STSwinNet/STSwinNet.py:14-138
- STT_MultiResUNet: STSwinNet.py:140-306
- STTFlowNet / STTFlowNet_4en: STSwinNet.py:309-499 (input chunking into
  num_split time groups, pad-to-even, per-scale nearest upsample of flows)
- MultiResUNet (plain conv U-Net): /root/reference/models/unet.py:143-258
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..ops.interpolate import resize_nearest
from ..ops.normalization import normalize_nonzero_std
from ..ops.pad import CropSize, skip_concat, skip_sum
from .ann_layers import (ConvLayer, ResidualBlock, TransposedConvLayer,
                         UpsampleConvLayer)
from .ann_patch_embed import ANN_PATCH_EMBEDS
from .ann_swin import SwinStage
from .common import SwinConfig


class SwinTransformer3DBackbone(nn.Module):
    """ANN Swin-3D backbone over [T, B, H, W, C_patch] temporal groups.
    Returns per-stage pre-merge features [B, D, H_i, W_i, C_i] (LayerNormed).
    """

    swin: SwinConfig
    embed_dim: int = 96

    @nn.compact
    def __call__(self, x, train: bool = False):
        sw = self.swin
        embed_cls = ANN_PATCH_EMBEDS[sw.patch_embed_type]
        x = embed_cls(img_size=tuple(sw.input_size),
                      patch_size=tuple(sw.patch_size),
                      embed_dim=self.embed_dim,
                      name="patch_embed")(x, train)  # [B, D, H', W', C]

        depths = sw.depths
        dpr = np.linspace(0, sw.drop_path_rate, sum(depths)).tolist()
        outs = []
        for i, depth in enumerate(depths):
            stage = SwinStage(
                dim=int(self.embed_dim * 2 ** i), depth=depth,
                num_heads=sw.num_heads[i], window_size=tuple(sw.window_size),
                mlp_ratio=sw.mlp_ratio, version=sw.arc_type,
                qkv_bias=sw.qkv_bias,
                qk_scale=sw.qk_scale if sw.arc_type == "swinv1" else None,
                pretrained_window_size=tuple(sw.pretrained_window_size),
                drop_path_rates=tuple(dpr[sum(depths[:i]):sum(depths[:i + 1])]),
                downsample=i < len(depths) - 1, name=f"stage{i}")
            x, pre_merge = stage(x, train)
            if i in sw.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")(pre_merge)
                outs.append(out)
        return tuple(outs)


class STTEncoder(nn.Module):
    """Backbone + per-stage per-timestep 1x1 projections collapsing the
    temporal axis into channels: [B, D, H, W, C] -> [B, H, W, C]."""

    swin: SwinConfig
    embed_dim: int = 96
    num_blocks: int = 2  # temporal groups (D after patch embed)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = SwinTransformer3DBackbone(self.swin, self.embed_dim,
                                          name="swin3d")(x, train)
        outs = []
        for i, f in enumerate(feats):
            B, D, H, Wd, C = f.shape
            assert D == self.num_blocks, (D, self.num_blocks)
            proj = []
            for k in range(self.num_blocks):
                proj.append(nn.Dense(C // self.num_blocks,
                                     name=f"proj{i}_{k}")(f[:, k]))
            outs.append(jnp.concatenate(proj, axis=-1))  # [B, H, W, C]
        return outs


class STTMultiResUNet(nn.Module):
    """Swin encoder + ResidualBlocks + multi-res conv decoder."""

    swin: SwinConfig
    base_num_channels: int = 96
    num_encoders: int = 3
    num_residual_blocks: int = 2
    num_output_channels: int = 2
    kernel_size: int = 3
    skip_type: str = "concat"
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    final_activation: Optional[str] = None
    num_blocks: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip_ftn = skip_concat if self.skip_type == "concat" else skip_sum
        blocks = STTEncoder(self.swin, self.base_num_channels,
                            self.num_blocks, name="encoders")(x, train)
        assert len(blocks) == self.num_encoders

        x = blocks[-1]
        for i in range(self.num_residual_blocks):
            x = ResidualBlock(x.shape[-1], 1, "relu", self.norm,
                              name=f"resblock{i}")(x, train)

        dec_cls = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer
        out_sizes = [int(self.base_num_channels * 2 ** i)
                     for i in range(self.num_encoders)]
        in_sizes = [self.base_num_channels] + out_sizes[:-1]
        decoder_out = list(reversed(in_sizes))

        predictions = []
        for i in range(self.num_encoders):
            x = skip_ftn(x, blocks[self.num_encoders - i - 1], axis=-1)
            if i > 0:
                x = skip_ftn(predictions[-1], x, axis=-1)
            x = dec_cls(decoder_out[i], self.kernel_size, activation="relu", norm=self.norm,
                        name=f"decoder{i}")(x, train)
            predictions.append(
                ConvLayer(self.num_output_channels, 1, activation=self.final_activation,
                          norm=None, name=f"pred{i}")(x, train))
        return predictions


class STTFlowNet(nn.Module):
    """Top-level ANN flow net. Registry names: STTFlowNet (3 encoders),
    STTFlowNet_4en (4 encoders)."""

    swin: SwinConfig
    num_bins: int = 20
    base_num_channels: int = 96
    kernel_size: int = 3
    num_encoders: int = 3
    use_upsample_conv: bool = True
    norm: Optional[str] = None
    final_activation: Optional[str] = None
    norm_input: bool = False
    encoding: str = "voxel"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, bins, H, W] signed voxels (or counts)
        B, bins, H, Wd = x.shape
        patch_t = self.swin.patch_size[0]
        num_split = self.num_bins // patch_t

        if bins != self.num_bins:
            # two-window path: reference frame group from chunk1 + groups of
            # chunk2 (STSwinNet.py:420-430)
            chunk1, chunk2 = x[:, :self.num_bins], x[:, self.num_bins:]
            if self.norm_input:
                chunk1 = normalize_nonzero_std(chunk1)
                chunk2 = normalize_nonzero_std(chunk2)
            groups = jnp.split(chunk2, num_split, axis=1)
            ref = jnp.split(chunk1, num_split, axis=1)[-1]
            x = jnp.stack([ref] + list(groups), axis=0)  # [T+1, B, C, H, W]
            num_blocks = num_split + 1
        else:
            x = jnp.stack(jnp.split(x, num_split, axis=1), axis=0)
            num_blocks = num_split
        x = x.transpose(0, 1, 3, 4, 2)  # [T, B, H, W, patch_t]

        crop = CropSize(Wd, H, {"h": 2, "w": 2})
        if H % 2 or Wd % 2:
            x = crop.pad(x)

        sw = self.swin.replace(input_size=(x.shape[2], x.shape[3]))
        preds = STTMultiResUNet(
            swin=sw, base_num_channels=self.base_num_channels,
            num_encoders=self.num_encoders, kernel_size=self.kernel_size,
            norm=self.norm, use_upsample_conv=self.use_upsample_conv,
            final_activation=self.final_activation, num_blocks=num_blocks,
            name="sttmultires_unet")(x, train)

        flow_list = []
        for p in preds:  # [B, h, w, 2]
            flow = resize_nearest(p, (x.shape[2], x.shape[3]))
            if H % 2 or Wd % 2:
                flow = crop.crop(flow)
            flow_list.append(flow.transpose(0, 3, 1, 2))
        return {"flow": flow_list, "attn": None}


class MultiResUNetFlow(nn.Module):
    """Plain conv multi-res U-Net (unet.py:143-258) with the flow-output
    contract: stride-2 conv encoders, residual bottleneck, multi-res
    prediction decoder."""

    num_bins: int = 10
    base_num_channels: int = 32
    num_encoders: int = 4
    num_residual_blocks: int = 2
    num_output_channels: int = 2
    kernel_size: int = 5
    skip_type: str = "concat"
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    final_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, bins, H, Wd = x.shape
        x = x.transpose(0, 2, 3, 1)
        skip_ftn = skip_concat if self.skip_type == "concat" else skip_sum
        out_sizes = [int(self.base_num_channels * 2 ** (i + 1))
                     for i in range(self.num_encoders)]
        in_sizes = [int(self.base_num_channels * 2 ** i)
                    for i in range(self.num_encoders)]
        blocks = []
        for i, out_size in enumerate(out_sizes):
            x = ConvLayer(out_size, self.kernel_size, stride=2, activation="relu",
                          norm=self.norm, name=f"encoder{i}")(x, train)
            blocks.append(x)
        for i in range(self.num_residual_blocks):
            x = ResidualBlock(out_sizes[-1], 1, "relu", self.norm,
                              name=f"resblock{i}")(x, train)
        dec_cls = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer
        decoder_out = list(reversed(in_sizes))
        predictions = []
        for i in range(self.num_encoders):
            x = skip_ftn(x, blocks[self.num_encoders - i - 1], axis=-1)
            if i > 0:
                x = skip_ftn(predictions[-1], x, axis=-1)
            x = dec_cls(decoder_out[i], self.kernel_size, activation="relu", norm=self.norm,
                        name=f"decoder{i}")(x, train)
            predictions.append(
                ConvLayer(self.num_output_channels, 1, activation=self.final_activation,
                          norm=None, name=f"pred{i}")(x, train))
        flow_list = []
        for p in predictions:
            flow = resize_nearest(p, (H, Wd))
            flow_list.append(flow.transpose(0, 3, 1, 2))
        return {"flow": flow_list, "attn": None}
