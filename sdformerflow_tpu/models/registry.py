"""Model registry: explicit name -> constructor mapping.

Replaces the reference's ``model = eval(config['model']['name'])(...)``
(/root/reference/train_flow_parallel_supervised_SNN.py:68) with a registry.
Constructors take ``(model_cfg: dict, swin_cfg: SwinConfig,
spiking_cfg: SpikingConfig)`` and return a flax module with the
``{"flow": [...]}`` output contract.
"""

from __future__ import annotations

from typing import Callable, Dict

from .common import SpikingConfig, SwinConfig

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


def get_model(name: str, model_cfg: dict, swin_cfg: SwinConfig,
              spiking_cfg: SpikingConfig):
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: "
                       f"{sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](model_cfg, swin_cfg, spiking_cfg)


def _spikingformer(model_cfg, swin_cfg, spiking_cfg, *, ms, num_en):
    from .snn_flownet import SpikingformerFlowNet
    return SpikingformerFlowNet(
        swin=swin_cfg,
        cfg=spiking_cfg,
        num_bins=model_cfg.get("num_bins", 10),
        base_num_channels=model_cfg.get("base_num_channels", 96),
        kernel_size=model_cfg.get("kernel_size", 3),
        num_encoders=num_en,
        use_upsample_conv=model_cfg.get("use_upsample_conv", False),
        ms=ms,
    )


@register_model("SpikingformerFlowNet")
def _sf(model_cfg, swin_cfg, spiking_cfg):
    return _spikingformer(model_cfg, swin_cfg, spiking_cfg, ms=False, num_en=3)


@register_model("MS_SpikingformerFlowNet")
def _mssf(model_cfg, swin_cfg, spiking_cfg):
    return _spikingformer(model_cfg, swin_cfg, spiking_cfg, ms=True, num_en=3)


@register_model("MS_SpikingformerFlowNet_en4")
def _mssf4(model_cfg, swin_cfg, spiking_cfg):
    return _spikingformer(model_cfg, swin_cfg, spiking_cfg, ms=True, num_en=4)


@register_model("SpikingMultiResUNet")
def _smru(model_cfg, swin_cfg, spiking_cfg):
    from .snn_flownet import SpikingMultiResUNetFlow
    return SpikingMultiResUNetFlow(
        cfg=spiking_cfg,
        num_bins=model_cfg.get("num_bins", 10),
        base_num_channels=model_cfg.get("base_num_channels", 32),
        num_encoders=model_cfg.get("num_encoders", 4),
        kernel_size=model_cfg.get("kernel_size", 5),
        use_upsample_conv=model_cfg.get("use_upsample_conv", True),
        ms=model_cfg.get("ms", False),
    )


def _sttflownet(model_cfg, swin_cfg, spiking_cfg, *, num_en):
    from .ann_flownet import STTFlowNet
    # the reference ANN builders never plumb qk_scale (STSwinNet.py:61-100),
    # so the ANN attention always uses head_dim**-0.5; the 0.125 default in
    # training/config.py mirrors the SNN backbone's hard-coded ctor default
    # (Spiking_swin_transformer3D.py:1150) and must not leak into the ANN
    # family (found by tests/test_reference_parity_zoo.py swin-v1 A/B).
    swin_cfg = swin_cfg.replace(qk_scale=None)
    return STTFlowNet(
        swin=swin_cfg,
        num_bins=model_cfg.get("num_bins", 10),
        base_num_channels=model_cfg.get("base_num_channels", 96),
        kernel_size=model_cfg.get("kernel_size", 3),
        num_encoders=num_en,
        use_upsample_conv=model_cfg.get("use_upsample_conv", True),
        norm=model_cfg.get("norm"),
        final_activation=model_cfg.get("final_activation"),
        norm_input=bool(model_cfg.get("norm_input", False)),
        encoding=model_cfg.get("encoding", "voxel"),
    )


@register_model("STTFlowNet")
def _stt(model_cfg, swin_cfg, spiking_cfg):
    return _sttflownet(model_cfg, swin_cfg, spiking_cfg, num_en=3)


@register_model("STTFlowNet_4en")
def _stt4(model_cfg, swin_cfg, spiking_cfg):
    return _sttflownet(model_cfg, swin_cfg, spiking_cfg, num_en=4)


@register_model("MultiResUNet")
def _mru(model_cfg, swin_cfg, spiking_cfg):
    from .ann_flownet import MultiResUNetFlow
    return MultiResUNetFlow(
        num_bins=model_cfg.get("num_bins", 10),
        base_num_channels=model_cfg.get("base_num_channels", 32),
        num_encoders=model_cfg.get("num_encoders", 4),
        kernel_size=model_cfg.get("kernel_size", 5),
        norm=model_cfg.get("norm"),
        use_upsample_conv=model_cfg.get("use_upsample_conv", True),
        final_activation=model_cfg.get("final_activation"),
    )
