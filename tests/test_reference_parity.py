"""Full-model A/B parity vs the ACTUAL reference implementation.

Imports the reference models from /root/reference (read-only) through the
vendored spikingjelly/timm stubs (tests/refharness), initializes the torch
model, converts its state_dict with training/torch_interop, and runs both
frameworks on identical tensors in float64. Asserts the multi-scale flow
outputs agree to machine precision (<= 1e-9 relative).

float64 is essential: spiking thresholds amplify float32 conv
accumulation-order noise (~1e-6) into flipped spikes and macroscopically
different flows; in f64 the two implementations agree to ~1e-13.

These tests found (round 2) three real parity bugs now fixed:
- transposed-conv geometry (flax SAME vs torch zero-insert + flipped kernel),
- LayerNorm epsilon (flax 1e-6 default vs torch 1e-5),
- the swin-v2 relative_coords_table W-axis normalization quirk.

Reference protocol match: eval_DSEC_flow_SNN.py:88-105 (model construction,
reset_net, set_step_mode('m'), eval) and Spiking_STSwinNet.py:278-305.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")  # refharness
from refharness import import_reference_models, sj_functional  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdformerflow_tpu.training.config import build_configs  # noqa: E402
from sdformerflow_tpu.models import get_model  # noqa: E402
from sdformerflow_tpu.training import torch_interop as TI  # noqa: E402


@pytest.fixture()
def f64():
    """float64 on both frameworks; restore after."""
    import torch
    prev_t = torch.get_default_dtype()
    prev_float = torch.Tensor.float
    torch.set_default_dtype(torch.float64)
    # the reference hard-casts with .float() (Spiking_swin_transformer3D.py
    # :671); keep those tensors in f64 for the comparison
    torch.Tensor.float = lambda self: self.to(torch.float64)
    try:
        with jax.enable_x64(True):
            yield torch
    finally:
        torch.set_default_dtype(prev_t)
        torch.Tensor.float = prev_float


def _snn_cfg(name, neuron, depths, heads, embed, input_size,
             base=32, num_bins=10):
    model_cfg = {
        "name": name, "encoding": "voxel", "norm_input": "minmax",
        "num_bins": num_bins, "base_num_channels": base, "kernel_size": 3,
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
        "swin_patch_size": [1, 1, 2, 2], "window_size": [2, 3, 3],
        "pretrained_window_size": [0, 0, 0], "mlp_ratio": 2,
        "input_size": list(input_size)}
    return model_cfg, swin_cfg


def _run_ab(torch, ref_model, model_cfg, swin_cfg, x_np, family="snn"):
    functional = sj_functional()
    torch.manual_seed(0)
    tmodel = ref_model(model_cfg.copy(), swin_cfg.copy())
    tmodel.init_weights()
    functional.reset_net(tmodel)
    functional.set_step_mode(tmodel, "m")
    tmodel.double()
    tmodel.eval()
    with torch.no_grad():
        if family == "ann":
            tout = tmodel(torch.from_numpy(x_np), None)
        else:
            tout = tmodel(torch.from_numpy(x_np))
    tflows = [f.numpy() for f in tout["flow"]]

    cfg = {"model": model_cfg, "swin_transformer": swin_cfg, "loader": {}}
    m_cfg, swin, spiking = build_configs(cfg)
    fmodel = get_model(model_cfg["name"], m_cfg, swin, spiking)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    depths = swin.depths
    params, bs, unmatched = TI.convert_state_dict(
        sd, num_stages=len(depths), max_depth=max(depths),
        num_encoders=len(depths), family=family)
    # relative_position_index / relative_coords_table are deterministic
    # buffers rebuilt on the flax side (ops/windows.py, verified identical in
    # test_reference_neuron_module_parity's sibling probes); everything else
    # must map.
    unmatched = [k for k in unmatched
                 if "relative_position_index" not in k
                 and "relative_coords_table" not in k]
    assert unmatched == [], f"unmatched torch keys: {unmatched[:8]}"

    variables = {"params": params, "batch_stats": bs}
    fout = fmodel.apply(variables, jnp.asarray(x_np), False)
    fflows = [np.asarray(f) for f in fout["flow"]]

    assert len(tflows) == len(fflows)
    for i, (tf, ff) in enumerate(zip(tflows, fflows)):
        assert tf.shape == ff.shape, (i, tf.shape, ff.shape)
        denom = np.abs(tf).max() + 1e-12
        rel = np.abs(tf - ff).max() / denom
        assert rel < 1e-9, f"scale {i}: rel diff {rel:.3e}"
    # guard against a vacuous pass (dead network producing all-zero flow)
    assert tflows[-1].std() > 1e-3, "reference produced ~zero flow"


# ---------------------------------------------------------------------------


def test_ms_en4_psn_forward_parity(f64):
    """Flagship MS_SpikingformerFlowNet_en4 with PSN (the eval protocol
    model, configs/train_DSEC_supervised_SDformerFlow_en4.yml)."""
    ref_snn, _ = import_reference_models()
    m, s = _snn_cfg("MS_SpikingformerFlowNet_en4", "psn",
                    (1, 1, 1, 1), (2, 2, 4, 4),
                    "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
    x = np.random.RandomState(1).rand(1, 10, 2, 96, 96).astype(np.float64)
    _run_ab(f64, ref_snn.MS_SpikingformerFlowNet_en4, m, s, x)


def test_ms_en4_if_forward_parity(f64):
    """Same architecture with stateful IF neurons (exercises the
    charge/fire/reset scan at every site incl. the fixed deconv)."""
    ref_snn, _ = import_reference_models()
    m, s = _snn_cfg("MS_SpikingformerFlowNet_en4", "if",
                    (1, 1, 1, 1), (2, 2, 4, 4),
                    "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
    x = np.random.RandomState(2).rand(1, 10, 2, 96, 96).astype(np.float64)
    _run_ab(f64, ref_snn.MS_SpikingformerFlowNet_en4, m, s, x)


def test_sew_en3_lif_forward_parity(f64):
    """SEW family, 3 encoders, depth-2 stage (shifted windows + masks),
    LIF soft reset, SEW patch embed."""
    ref_snn, _ = import_reference_models()
    m, s = _snn_cfg("SpikingformerFlowNet", "lif",
                    (1, 2, 1), (2, 2, 4),
                    "Spiking_PatchEmbed_Conv_sfn", (48, 48))
    x = np.random.RandomState(3).rand(1, 10, 2, 48, 48).astype(np.float64)
    _run_ab(f64, ref_snn.SpikingformerFlowNet, m, s, x)


def test_sew_en3_psn_forward_parity(f64):
    ref_snn, _ = import_reference_models()
    m, s = _snn_cfg("SpikingformerFlowNet", "psn",
                    (1, 2, 1), (2, 2, 4),
                    "Spiking_PatchEmbed_Conv_sfn", (48, 48))
    x = np.random.RandomState(4).rand(1, 10, 2, 48, 48).astype(np.float64)
    _run_ab(f64, ref_snn.SpikingformerFlowNet, m, s, x)


def test_ann_sttflownet_swinv2_forward_parity(f64):
    """ANN STTFlowNet: swin-v2 cosine attention + cpb, PatchEmbedLocal,
    two-chunk input quirk, norm_input std-normalize
    (configs/train_DSEC_supervised_STT_voxel.yml)."""
    _, ref_ann = import_reference_models()
    model_cfg = {
        "name": "STTFlowNet", "encoding": "voxel", "norm_input": True,
        "num_bins": 20, "base_num_channels": 32, "kernel_size": 3,
        "activations": ["relu", None], "final_activation": None,
        "mask_output": True, "norm": None, "spiking_neuron": None}
    swin_cfg = {
        "use_arc": ["swinv2", "PatchEmbedLocal"],
        "swin_depths": [1, 2, 1], "swin_num_heads": [2, 2, 4],
        "swin_out_indices": [0, 1, 2], "swin_patch_size": [10, 4, 4],
        "window_size": [2, 3, 3], "pretrained_window_size": [0, 0, 0],
        "mlp_ratio": 2, "input_size": [96, 96]}
    x = np.random.RandomState(5).randn(1, 20, 96, 96).astype(np.float64)
    _run_ab(f64, ref_ann.STTFlowNet, model_cfg, swin_cfg, x, family="ann")


# ---------------------------------------------------------------------------
# Neuron-module-level A/B against the reference's OWN neuron classes
# (SLTTLIFNode / GatedLIFNode / PSN live in the reference file itself, so
# this exercises actual reference code, not a re-derivation).


@pytest.mark.parametrize("neuron", ["glif", "sltt", "psn"])
def test_reference_neuron_module_parity(f64, neuron):
    import importlib
    import_reference_models()
    sub = importlib.import_module(
        "models.STSwinNet_SNN.Spiking_submodules")
    torch = f64
    from sdformerflow_tpu.ops import neurons as N
    from sdformerflow_tpu.ops.surrogate import atan_spike

    T, shape = 10, (10, 2, 4, 3, 3)  # [T, B, C, H, W]
    x = np.random.RandomState(7).randn(*shape).astype(np.float64) * 0.5

    if neuron == "glif":
        torch.manual_seed(0)
        node = sub.GatedLIFNode(T=T, init_tau=0.25, init_v_threshold=0.5,
                                init_conduct=0.5)
        node.double().eval()
        with torch.no_grad():
            t_out = node(torch.from_numpy(x)).numpy()
        params = N.GLIFParams(
            alpha=jnp.asarray(node.alpha.detach().numpy()),
            beta=jnp.asarray(node.beta.detach().numpy()),
            gamma=jnp.asarray(node.gamma.detach().numpy()),
            tau=jnp.asarray(node.tau.detach().numpy()),
            v_threshold=jnp.asarray(node.v_threshold.detach().numpy()),
            linear_decay=jnp.asarray(node.linear_decay.detach().numpy()),
            v_subreset=jnp.asarray(node.v_subreset.detach().numpy()),
            conduct=jnp.asarray(node.conduct.detach().numpy()))
        j_out = np.asarray(N.glif_neuron(jnp.asarray(x), params,
                                         surrogate_fn=atan_spike))
    elif neuron == "sltt":
        node = sub.SLTTLIFNode(tau=2.0, v_threshold=0.1, v_reset=None,
                               detach_reset=True)
        node.eval()
        with torch.no_grad():
            t_out = np.stack([node(torch.from_numpy(x[t])).numpy()
                              for t in range(T)])
        j_out = np.asarray(N.sltt_lif_neuron(jnp.asarray(x), v_th=0.1,
                                             v_reset=None, tau=2.0,
                                             surrogate_fn=atan_spike))
    else:  # psn
        x = x * 8.0  # PSN bias init is -1: keep real spiking activity
        torch.manual_seed(0)
        node = sub.PSN(T=T)
        node.double().eval()
        with torch.no_grad():
            t_out = node(torch.from_numpy(x)).numpy()
        j_out = np.asarray(N.psn_neuron(
            jnp.asarray(x), jnp.asarray(node.weight.detach().numpy()),
            jnp.asarray(node.bias.detach().numpy()),
            surrogate_fn=atan_spike))
    assert t_out.shape == j_out.shape
    assert np.array_equal(t_out, j_out), (
        f"{neuron}: {np.abs(t_out - j_out).max()}")
    assert 0.0 < t_out.mean() < 1.0  # real spiking activity
