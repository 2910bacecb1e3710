"""Flagship-ARCHITECTURE-scale A/B vs the reference (VERDICT r2 #4).

The round-2 parity matrix stopped at depths <= (1,2,1,1), window (2,3,3),
base 32. These tests run the SHIPPED architecture shape — depths (2,2,6,2),
window (2,9,9), base 96, mlp_ratio 4 (reference
configs/train_DSEC_supervised_SDformerFlow_en4.yml:32-39,
Spiking_STSwinNet.py:319-325) — at 144x144 input (stage-0/1 patch grids
36/18: >= 2 shifted 9x9 windows per axis, real mask geometry) including the
depth-6 stage's alternating shift schedule and the dpr spacing. f64, same
harness as tests/test_reference_parity.py.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from refharness import import_reference_models  # noqa: E402

from test_reference_parity import _run_ab, f64  # noqa: E402,F401


def _scale_cfg(name, neuron, depths, heads, embed, input_size):
    model_cfg = {
        "name": name, "encoding": "voxel", "norm_input": "minmax",
        "num_bins": 10, "base_num_channels": 96, "kernel_size": 3,
        "activations": ["relu", None], "final_activation": None,
        "mask_output": True, "norm": None, "use_upsample_conv": False,
        "spiking_neuron": {
            "num_steps": 10, "v_th": 0.1, "v_reset": None,
            "neuron_type": neuron, "surrogate_fun": "surrogate.ATan()",
            "tau": 2.0, "detach_reset": True, "spike_norm": "BN"}}
    swin_cfg = {
        "use_arc": ["swinv1", embed],
        "swin_depths": list(depths), "swin_num_heads": list(heads),
        "swin_out_indices": list(range(len(depths))),
        "swin_patch_size": [1, 1, 2, 2], "window_size": [2, 9, 9],
        "pretrained_window_size": [0, 0, 0], "mlp_ratio": 4,
        "input_size": list(input_size)}
    return model_cfg, swin_cfg


@pytest.mark.slow
def test_flagship_scale_ms_en4_psn(f64):
    """The eval-protocol architecture at full depth/width/window.

    288x288 is the smallest square input the REFERENCE can run at this
    architecture: its K positional encoding is allocated for the configured
    window but reshaped with the clamped per-stage window dims, so any stage
    resolution below 9x9 patches crashes with a RuntimeError
    (Spiking_swin_transformer3D.py:678 — shape [2,1,5,5,768] vs the 9x9
    buffer). The shipped 288x384 eval config keeps stage 3 at 9x12, never
    clamping; 288x288 keeps it at 9x9 likewise."""
    ref_snn, _ = import_reference_models()
    m, s = _scale_cfg("MS_SpikingformerFlowNet_en4", "psn",
                      (2, 2, 6, 2), (3, 6, 12, 24),
                      "MS_PED_Spiking_PatchEmbed_Conv_sfn", (288, 288))
    x = np.random.RandomState(11).rand(1, 10, 2, 288, 288).astype(np.float64)
    _run_ab(f64, ref_snn.MS_SpikingformerFlowNet_en4, m, s, x)


@pytest.mark.slow
def test_flagship_scale_sew_en3_lif(f64):
    """SEW/LIF counterpart at the same window/depth scale (3 encoders)."""
    ref_snn, _ = import_reference_models()
    m, s = _scale_cfg("SpikingformerFlowNet", "lif",
                      (2, 2, 6), (3, 6, 12),
                      "Spiking_PatchEmbed_Conv_sfn", (144, 144))
    x = np.random.RandomState(12).rand(1, 10, 2, 144, 144).astype(np.float64)
    _run_ab(f64, ref_snn.SpikingformerFlowNet, m, s, x)
