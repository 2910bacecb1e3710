"""Spiking Swin-3D backbone, spikeformer multi-res U-Net, and the top-level
SDformerFlow networks.

Public contract (matching the reference drivers):
- input: per-polarity voxel chunk ``[B, bins, 2, H, W]`` (already
  polarity-split / normalized / optionally binarized — see
  ops.normalization.encode_input);
- output: ``{"flow": [coarse -> fine], "attn": None}`` where each flow map is
  ``[B, 2, H, W]`` at full input resolution (spike outputs summed over T
  before upsampling).

Parity targets:
- Spiking_SwinTransformer3D_v2 / MS_ backbone:
  /root/reference/models/STSwinNet_SNN/Spiking_swin_transformer3D.py:1132-1292
- spiking_former_encoder / Spikingformer_MultiResUNet / MS_ variants and the
  flow nets: /root/reference/models/STSwinNet_SNN/Spiking_STSwinNet.py:8-325
- SpikingMultiResUNet (conv-encoder spiking U-Net):
  /root/reference/models/STSwinNet_SNN/SNN_models.py:12-216
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..ops.interpolate import resize_nearest
from ..ops.pad import skip_concat, skip_sum
from .common import SpikingConfig, SwinConfig
from .spiking_layers import (MSResBlock, MSSpikingConvEncoderLayer,
                             MSSpikingDecoderLayer, MSSpikingPredLayer,
                             MSSpikingTransposeDecoderLayer, SEWResBlock,
                             SpikingConvEncoderLayer, SpikingDecoderLayer,
                             SpikingPredLayer, SpikingTransposeDecoderLayer)
from .spiking_patch_embed import (MSPEDSpikingPatchEmbedConvSfn,
                                  MSSpikingPatchEmbedConvLocal,
                                  SpikingPatchEmbedConv,
                                  SpikingPatchEmbedConvSfn,
                                  SpikingPatchEmbedLocal,
                                  SpikingPatchEmbedSfn, chunk_regroup,
                                  sfn_regroup)
from .spiking_swin import SpikingNorm, SpikingSwinStage

PATCH_EMBEDS = {
    "Spiking_PatchEmbedLocal": lambda **kw: SpikingPatchEmbedLocal(use_ms=False, **kw),
    "MS_Spiking_PatchEmbedLocal": lambda **kw: SpikingPatchEmbedLocal(use_ms=True, **kw),
    "Spiking_PatchEmbed_sfn": lambda **kw: SpikingPatchEmbedSfn(use_ms=False, **kw),
    "MS_Spiking_PatchEmbed_sfn": lambda **kw: SpikingPatchEmbedSfn(use_ms=True, **kw),
    "Spiking_PatchEmbed_Conv": lambda **kw: SpikingPatchEmbedConv(use_ms=False, **kw),
    "MS_Spiking_PatchEmbed_Conv": lambda **kw: SpikingPatchEmbedConv(use_ms=True, **kw),
    "Spiking_PatchEmbed_Conv_sfn": lambda **kw: SpikingPatchEmbedConvSfn(use_ms=False, **kw),
    "MS_Spiking_PatchEmbed_Conv_sfn": lambda **kw: SpikingPatchEmbedConvSfn(use_ms=True, **kw),
    "MS_Spiking_PatchEmbed_Conv_Local": lambda **kw: MSSpikingPatchEmbedConvLocal(**kw),
    "MS_PED_Spiking_PatchEmbed_Conv_sfn": lambda **kw: MSPEDSpikingPatchEmbedConvSfn(**kw),
}


class SpikingSwinTransformer3D(nn.Module):
    """Spiking Swin-3D backbone; returns per-stage time-major features
    ``[T, B, H_i, W_i, C_i]`` for each out_index."""

    swin: SwinConfig
    cfg: SpikingConfig
    in_chans: int = 10
    embed_dim: int = 96
    spikformer_norm: Optional[str] = "BN"
    ms: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False,
                 collect_attention: bool = False,
                 pre_embedded: bool = False):
        sw = self.swin
        if pre_embedded:
            # x is already the patch-embed output [T, B, H', W', C] (e.g.
            # computed by ops.pallas_embed.fused_embed_forward); the
            # patch_embed params simply go unused in this apply.
            pass
        else:
            embed = PATCH_EMBEDS[sw.patch_embed_type](
                img_size=tuple(sw.input_size),
                patch_size=tuple(sw.patch_size),
                in_chans=self.in_chans, embed_dim=self.embed_dim,
                cfg=self.cfg, name="patch_embed")
            x = embed(x, train)                   # [T, B, H', W', C]
        # stages run time-major [D=T, B, H, W, C]: no layout change needed

        depths = sw.depths
        dpr = np.linspace(0, sw.drop_path_rate, sum(depths)).tolist()
        outs, attns = [], []
        for i, depth in enumerate(depths):
            stage = SpikingSwinStage(
                dim=int(self.embed_dim * 2 ** i),
                depth=depth,
                num_heads=sw.num_heads[i],
                cfg=self.cfg,
                window_size=tuple(sw.window_size),
                mlp_ratio=sw.mlp_ratio,
                version=sw.arc_type,
                qk_scale=sw.qk_scale,
                pretrained_window_size=tuple(sw.pretrained_window_size),
                norm=self.spikformer_norm,
                drop_path_rates=tuple(
                    dpr[sum(depths[:i]):sum(depths[:i + 1])]),
                downsample=i < len(depths) - 1,
                ms=self.ms,
                name=f"stage{i}")
            if collect_attention:
                x, pre_merge, attn = stage(x, train, collect_attention=True)
                attns.append(attn)
            else:
                x, pre_merge = stage(x, train)
            if i in sw.out_indices:
                out = pre_merge
                if self.spikformer_norm in ("LN", "GN"):
                    out = SpikingNorm(out.shape[-1], self.cfg.num_steps,
                                      self.spikformer_norm, self.cfg.v_th,
                                      name=f"norm{i}")(out, train)
                outs.append(out)  # already [T, B, H, W, C]
        if collect_attention:
            return tuple(outs), attns
        return tuple(outs)


class SpikingformerMultiResUNet(nn.Module):
    """Spikeformer encoder + spiking conv multi-res decoder.

    Returns the list of per-scale predictions ``[T, B, h_i, w_i, 2]``
    (coarse -> fine)."""

    swin: SwinConfig
    cfg: SpikingConfig
    num_bins: int = 10
    base_num_channels: int = 96
    num_encoders: int = 4
    num_residual_blocks: int = 2
    num_output_channels: int = 2
    kernel_size: int = 3
    skip_type: str = "concat"
    use_upsample_conv: bool = False
    ms: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, log: bool = False,
                 pre_embedded: bool = False):
        skip_ftn = skip_concat if self.skip_type == "concat" else skip_sum
        backbone = SpikingSwinTransformer3D(
            swin=self.swin, cfg=self.cfg, in_chans=self.num_bins,
            embed_dim=self.base_num_channels,
            spikformer_norm=self.cfg.spike_norm, ms=self.ms, name="encoders")
        attns = None
        if log:
            blocks, attns = backbone(x, train, collect_attention=True,
                                     pre_embedded=pre_embedded)
        else:
            blocks = backbone(x, train, pre_embedded=pre_embedded)
        assert len(blocks) == self.num_encoders

        x = blocks[-1]
        res_cls = MSResBlock if self.ms else SEWResBlock
        for i in range(self.num_residual_blocks):
            x = res_cls(x.shape[-1], self.cfg, name=f"resblock{i}")(x, train)

        if self.use_upsample_conv:
            dec_cls = MSSpikingDecoderLayer if self.ms else SpikingDecoderLayer
        else:
            dec_cls = (MSSpikingTransposeDecoderLayer if self.ms
                       else SpikingTransposeDecoderLayer)
        pred_cls = MSSpikingPredLayer if self.ms else SpikingPredLayer

        # decoder channel plan mirrors Spikingformer_MultiResUNet:
        # encoder_output_sizes = [base * 2^i], decoder outputs reversed
        # [base*2^(n-2), ..., base, base]
        out_sizes = [int(self.base_num_channels * 2 ** i)
                     for i in range(self.num_encoders)]
        in_sizes = [self.base_num_channels] + out_sizes[:-1]
        decoder_out = list(reversed(in_sizes))

        predictions = []
        for i in range(self.num_encoders):
            x = skip_ftn(x, blocks[self.num_encoders - i - 1], axis=-1)
            if i > 0:
                x = skip_ftn(predictions[-1], x, axis=-1)
            x = dec_cls(decoder_out[i], self.cfg, self.kernel_size,
                        name=f"decoder{i}")(x, train)
            pred = pred_cls(self.num_output_channels, self.cfg, 1,
                            name=f"pred{i}")(x, train)
            predictions.append(pred)
        if log:
            return predictions, attns
        return predictions


class SpikingformerFlowNet(nn.Module):
    """Top-level SDformerFlow: spikes summed over T, nearest-upsampled to the
    input resolution. Registry names: SpikingformerFlowNet (SEW, 3 encoders),
    MS_SpikingformerFlowNet (MS, 3), MS_SpikingformerFlowNet_en4 (MS, 4 —
    the paper's SDformerFlow)."""

    swin: SwinConfig
    cfg: SpikingConfig
    num_bins: int = 10
    base_num_channels: int = 96
    kernel_size: int = 3
    num_encoders: int = 4
    use_upsample_conv: bool = False
    ms: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, log: bool = False,
                 pre_embedded=None):
        if pre_embedded is not None:
            # (full-res input is still needed for the output resize)
            B, bins, P, H, Wd = x.shape
            x_in = pre_embedded
        else:
            B, bins, P, H, Wd = x.shape
            x_in = x
        unet = SpikingformerMultiResUNet(
            swin=self.swin, cfg=self.cfg, num_bins=self.num_bins,
            base_num_channels=self.base_num_channels,
            num_encoders=self.num_encoders, kernel_size=self.kernel_size,
            use_upsample_conv=self.use_upsample_conv, ms=self.ms,
            name="sttmultires_unet")
        attns = None
        if log:
            preds, attns = unet(x_in, train, log=True,
                                pre_embedded=pre_embedded is not None)
        else:
            preds = unet(x_in, train,
                         pre_embedded=pre_embedded is not None)
        flow_list = []
        for p in preds:                      # [T, B, h, w, 2]
            flow = p.sum(axis=0)             # sum spikes over time FIRST
            flow = resize_nearest(flow, (H, Wd))
            flow_list.append(flow.transpose(0, 3, 1, 2))  # [B, 2, H, W]
        return {"flow": flow_list, "attn": attns}


class SpikingMultiResUNetFlow(nn.Module):
    """Plain spiking U-Net (conv encoders, no transformer): the reference's
    SpikingMultiResUNet (SNN_models.py:12-216) wrapped with the flow-output
    contract. Input regroup: sfn (default) or chunk."""

    cfg: SpikingConfig
    num_bins: int = 10
    base_num_channels: int = 32
    num_encoders: int = 4
    num_residual_blocks: int = 2
    num_output_channels: int = 2
    kernel_size: int = 5
    skip_type: str = "concat"
    use_upsample_conv: bool = True
    input_sfn: bool = True
    ms: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, bins, P, H, Wd = x.shape
        skip_ftn = skip_concat if self.skip_type == "concat" else skip_sum
        x = x[:, :self.num_bins]
        regroup = sfn_regroup if self.input_sfn else chunk_regroup
        x = regroup(x, self.cfg.num_steps)

        enc_cls = MSSpikingConvEncoderLayer if self.ms else SpikingConvEncoderLayer
        res_cls = MSResBlock if self.ms else SEWResBlock
        if self.use_upsample_conv:
            dec_cls = MSSpikingDecoderLayer if self.ms else SpikingDecoderLayer
        else:
            dec_cls = (MSSpikingTransposeDecoderLayer if self.ms
                       else SpikingTransposeDecoderLayer)
        pred_cls = MSSpikingPredLayer if self.ms else SpikingPredLayer

        out_sizes = [int(self.base_num_channels * 2 ** (i + 1))
                     for i in range(self.num_encoders)]
        in_sizes = [int(self.base_num_channels * 2 ** i)
                    for i in range(self.num_encoders)]
        blocks = []
        for i, out_size in enumerate(out_sizes):
            kw = {"first_layer": i == 0} if self.ms else {}
            x = enc_cls(out_size, self.cfg, self.kernel_size, 2,
                        self.kernel_size // 2, name=f"encoder{i}",
                        **kw)(x, train)
            blocks.append(x)
        for i in range(self.num_residual_blocks):
            x = res_cls(out_sizes[-1], self.cfg, name=f"resblock{i}")(x, train)

        decoder_out = list(reversed(in_sizes))
        predictions = []
        for i in range(self.num_encoders):
            x = skip_ftn(x, blocks[self.num_encoders - i - 1], axis=-1)
            if i > 0:
                x = skip_ftn(predictions[-1], x, axis=-1)
            x = dec_cls(decoder_out[i], self.cfg, self.kernel_size,
                        name=f"decoder{i}")(x, train)
            predictions.append(pred_cls(self.num_output_channels, self.cfg, 1,
                                        name=f"pred{i}")(x, train))

        flow_list = []
        for p in predictions:
            flow = p.sum(axis=0)
            flow = resize_nearest(flow, (H, Wd))
            flow_list.append(flow.transpose(0, 3, 1, 2))
        return {"flow": flow_list, "attn": None}
