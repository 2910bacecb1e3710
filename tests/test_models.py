"""All registry entries build and run forward on tiny shapes, producing the
{"flow": [coarse -> fine]} contract at input resolution."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models import MODEL_REGISTRY, get_model
from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.ops.normalization import encode_input

H, W = 16, 16

SNN_SWIN = SwinConfig(
    arc_type="swinv1", patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
    input_size=(H, W), patch_size=(1, 1, 2, 2), depths=(1, 1),
    num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 2, 2),
    qk_scale=0.125, drop_path_rate=0.0)
ANN_SWIN = SwinConfig(
    arc_type="swinv2", patch_embed_type="PatchEmbedLocal",
    input_size=(H, W), patch_size=(2, 2, 2), depths=(1, 1),
    num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 2, 2),
    qk_scale=None, drop_path_rate=0.0)
SPIKING = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type="psn", spike_norm="BN")

CASES = {
    "SpikingformerFlowNet": (SNN_SWIN.replace(
        patch_embed_type="Spiking_PatchEmbed_Conv_sfn"), True),
    "MS_SpikingformerFlowNet": (SNN_SWIN, True),
    "MS_SpikingformerFlowNet_en4": (SNN_SWIN, True),
    "SpikingMultiResUNet": (SNN_SWIN, True),
    "STTFlowNet": (ANN_SWIN, False),
    "STTFlowNet_4en": (ANN_SWIN, False),
    "MultiResUNet": (ANN_SWIN, False),
}


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_registry_model_forward(name):
    swin, is_snn = CASES[name]
    num_en = 2
    model_cfg = {"num_bins": 4, "base_num_channels": 16, "kernel_size": 3,
                 "use_upsample_conv": False, "encoding": "voxel",
                 "num_encoders": 2}
    model = get_model(name, model_cfg, swin, SPIKING)
    # registry constructors fix num_encoders for the *FlowNet names; shrink
    # by overriding when possible
    if hasattr(model, "num_encoders") and model.num_encoders > 2:
        model = dataclasses.replace(model, num_encoders=2)
    if not CASES[name][1]:  # ANN family takes raw [B, bins, H, W] voxels
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, H, W))
    else:
        chunk = jax.random.normal(jax.random.PRNGKey(0), (1, 4, H, W))
        x = encode_input(chunk)
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, False)
    out = model.apply(variables, x, False)
    assert isinstance(out["flow"], list)
    for f in out["flow"]:
        assert f.shape == (1, 2, H, W)
        assert np.isfinite(np.asarray(f)).all()


def test_registry_unknown_model():
    with pytest.raises(KeyError):
        get_model("NoSuchModel", {}, SNN_SWIN, SPIKING)


@pytest.mark.parametrize("neuron", ["lif", "if", "plif", "psn", "glif",
                                    "SLTTlif"])
def test_en4_all_neuron_types(neuron):
    cfg = SPIKING.replace(neuron_type=neuron)
    model = get_model("MS_SpikingformerFlowNet_en4",
                      {"num_bins": 4, "base_num_channels": 16,
                       "use_upsample_conv": False}, SNN_SWIN, cfg)
    model = dataclasses.replace(model, num_encoders=2)
    chunk = jax.random.normal(jax.random.PRNGKey(0), (1, 4, H, W))
    x = encode_input(chunk)
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, False)
    out = model.apply(variables, x, False)
    assert np.isfinite(np.asarray(out["flow"][-1])).all()


def test_sep_conv_layers():
    from sdformerflow_tpu.models.spiking_layers import (
        MSSpikingSepConvEncoderBlock, MSSpikingSepPredLayer,
        MSSpikingSepTransposeDecoderLayer)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 1, 8, 8, 16))
    for mod, expect in [
        (MSSpikingSepConvEncoderBlock(16, 32, SPIKING), (4, 1, 8, 8, 16)),
        # two stride-2 deconvs (reference Spiking_modules.py:499-527) -> x4
        (MSSpikingSepTransposeDecoderLayer(8, SPIKING), (4, 1, 32, 32, 8)),
        (MSSpikingSepPredLayer(2, SPIKING), (4, 1, 8, 8, 2)),
    ]:
        v = mod.init(jax.random.PRNGKey(1), x)
        out = mod.apply(v, x)
        assert out.shape == expect, (type(mod).__name__, out.shape)
