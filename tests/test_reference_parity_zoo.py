"""Full-model A/B for the rest of the registry zoo (VERDICT r2 #9).

Covers every models/registry.py entry that round 2 left without a refharness
test: SpikingMultiResUNet (sfn AND chunk regroup, upsample AND transpose
decoders), MS_SpikingformerFlowNet (en3), STTFlowNet (ANN swin-v1) and
STTFlowNet_4en, plus GLIF and SLTT neurons end-to-end through the flagship
architecture. Same f64 harness as tests/test_reference_parity.py.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from refharness import import_reference_models, sj_functional  # noqa: E402
from test_reference_parity import _run_ab, _snn_cfg, f64  # noqa: E402,F401

import jax.numpy as jnp  # noqa: E402

from sdformerflow_tpu.models import get_model  # noqa: E402
from sdformerflow_tpu.models.snn_flownet import \
    SpikingMultiResUNetFlow  # noqa: E402
from sdformerflow_tpu.training import torch_interop as TI  # noqa: E402
from sdformerflow_tpu.training.config import build_configs  # noqa: E402


# ---------------------------------------------------------------------------
# plain spiking U-Net (SNN_models.SpikingMultiResUNet)


def _import_ref_unet():
    from refharness import install_stubs, REFERENCE_ROOT
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.STSwinNet_SNN.SNN_models as ref_unet
    return ref_unet


@pytest.mark.parametrize("neuron,input_sfn,use_upsample", [
    ("lif", True, True),     # sfn regroup + bilinear-upsample decoders
    ("psn", False, False),   # chunk regroup + transposed-conv decoders
])
def test_spiking_multires_unet_parity(f64, neuron, input_sfn, use_upsample):
    """A/B vs the reference's own SpikingMultiResUNet; the reference class
    returns the raw per-scale [T, B, 2, h, w] predictions (SNN_models.py:216)
    — the standard flow tail (sum over T, nearest upsample, reference
    quirk) is applied identically to both sides for the comparison."""
    torch = f64
    ref_unet = _import_ref_unet()
    functional = sj_functional()
    spiking = {"num_steps": 10, "v_th": 0.5 if neuron != "psn" else 0.1,
               "v_reset": None, "neuron_type": neuron,
               "surrogate_fun": "surrogate.ATan()", "tau": 2.0,
               "detach_reset": True, "spike_norm": "BN"}
    base, n_enc, n_res, bins = 8, 3, 2, 10
    torch.manual_seed(0)
    tmodel = ref_unet.SpikingMultiResUNet(
        base_num_channels=base, num_encoders=n_enc, num_residual_blocks=n_res,
        num_output_channels=2, skip_type="concat", norm=None,
        use_upsample_conv=use_upsample, num_bins=bins, kernel_size=3,
        spiking_neuron=dict(spiking))
    tmodel.input_sfn = input_sfn
    functional.reset_net(tmodel)
    functional.set_step_mode(tmodel, "m")
    tmodel.double()
    tmodel.eval()

    H = W = 32
    x_np = np.random.RandomState(31).rand(1, bins, 2, H, W)
    with torch.no_grad():
        tpreds = tmodel(torch.from_numpy(x_np))
    # flow tail on the torch side: sum spikes over T, nearest upsample
    tflows = []
    for p in tpreds:
        flow = p.sum(dim=0)                      # [B, 2, h, w]
        flow = torch.nn.functional.interpolate(flow, size=(H, W),
                                               mode="nearest")
        tflows.append(flow.numpy())

    cfg = {"model": {"spiking_neuron": spiking}, "swin_transformer": {},
           "loader": {}}
    _, _, spiking_cfg = build_configs(cfg)
    fmodel = SpikingMultiResUNetFlow(
        cfg=spiking_cfg, num_bins=bins, base_num_channels=base,
        num_encoders=n_enc, num_residual_blocks=n_res, kernel_size=3,
        use_upsample_conv=use_upsample, input_sfn=input_sfn, ms=False)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, bs, unmatched = TI.convert_with_rules(
        sd, TI.build_unet_rules(num_encoders=n_enc, num_res=n_res,
                                use_upsample_conv=use_upsample))
    assert unmatched == [], unmatched[:8]
    fout = fmodel.apply({"params": params, "batch_stats": bs},
                        jnp.asarray(x_np), False)
    assert len(fout["flow"]) == len(tflows)
    for i, (tf, ff) in enumerate(zip(tflows, fout["flow"])):
        ff = np.asarray(ff)
        assert tf.shape == ff.shape
        rel = np.abs(tf - ff).max() / (np.abs(tf).max() + 1e-12)
        assert rel < 1e-9, f"scale {i}: rel {rel:.3e}"
    assert tflows[-1].std() > 1e-3


# ---------------------------------------------------------------------------
# remaining swin-family configs


def test_ms_en3_psn_forward_parity(f64):
    """MS_SpikingformerFlowNet (3 encoders) — the registry entry round 2
    never A/B'd at full-model level."""
    ref_snn, _ = import_reference_models()
    m, s = _snn_cfg("MS_SpikingformerFlowNet", "psn",
                    (1, 2, 1), (2, 2, 4),
                    "MS_PED_Spiking_PatchEmbed_Conv_sfn", (48, 48))
    x = np.random.RandomState(32).rand(1, 10, 2, 48, 48).astype(np.float64)
    _run_ab(f64, ref_snn.MS_SpikingformerFlowNet, m, s, x)


def test_glif_full_model_parity(f64):
    """GLIF neurons end-to-end (layer-wise learnable gates,
    Spiking_submodules.py:94-180)."""
    ref_snn, _ = import_reference_models()
    m, s = _snn_cfg("MS_SpikingformerFlowNet_en4", "glif",
                    (1, 1, 1, 1), (2, 2, 4, 4),
                    "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
    x = np.random.RandomState(33).rand(1, 10, 2, 96, 96).astype(np.float64)
    _run_ab(f64, ref_snn.MS_SpikingformerFlowNet_en4, m, s, x)


def test_sltt_full_model_parity(f64):
    """SLTT LIF end-to-end (detached-carry membrane; forward == LIF)."""
    ref_snn, _ = import_reference_models()
    m, s = _snn_cfg("MS_SpikingformerFlowNet_en4", "SLTTlif",
                    (1, 1, 1, 1), (2, 2, 4, 4),
                    "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
    x = np.random.RandomState(34).rand(1, 10, 2, 96, 96).astype(np.float64)
    _run_ab(f64, ref_snn.MS_SpikingformerFlowNet_en4, m, s, x)


def _ann_cfg(name, depths, heads, input_size, arc="swinv1"):
    model_cfg = {
        "name": name, "encoding": "voxel", "norm_input": True,
        "num_bins": 20, "base_num_channels": 32, "kernel_size": 3,
        "activations": ["relu", None], "final_activation": None,
        "mask_output": True, "norm": None, "spiking_neuron": None}
    swin_cfg = {
        "use_arc": [arc, "PatchEmbedLocal"],
        "swin_depths": list(depths), "swin_num_heads": list(heads),
        "swin_out_indices": list(range(len(depths))),
        "swin_patch_size": [10, 4, 4], "window_size": [2, 3, 3],
        "pretrained_window_size": [0, 0, 0], "mlp_ratio": 2,
        "input_size": list(input_size)}
    return model_cfg, swin_cfg


def test_ann_sttflownet_swinv1_forward_parity(f64):
    """ANN STTFlowNet with the swin-V1 3D encoder (softmax + rel bias +
    qk scale) — round 2 only covered v1 at module level."""
    _, ref_ann = import_reference_models()
    m, s = _ann_cfg("STTFlowNet", (1, 2, 1), (2, 2, 4), (96, 96))
    x = np.random.RandomState(35).randn(1, 20, 96, 96).astype(np.float64)
    _run_ab(f64, ref_ann.STTFlowNet, m, s, x, family="ann")


def test_ann_sttflownet_4en_forward_parity(f64):
    _, ref_ann = import_reference_models()
    m, s = _ann_cfg("STTFlowNet_4en", (1, 1, 1, 1), (2, 2, 4, 4), (96, 96))
    x = np.random.RandomState(36).randn(1, 20, 96, 96).astype(np.float64)
    _run_ab(f64, ref_ann.STTFlowNet_4en, m, s, x, family="ann")
