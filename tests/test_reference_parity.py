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
    charge/fire/reset scan at every site incl. the fixed deconv) and a
    depth-2 stage, covering MS blocks with SHIFTED windows — whose QK
    attention deliberately ignores the shift mask (reference quirk,
    Spiking_swin_transformer3D.py:698-703)."""
    ref_snn, _ = import_reference_models()
    m, s = _snn_cfg("MS_SpikingformerFlowNet_en4", "if",
                    (1, 2, 1, 1), (2, 2, 4, 4),
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


def test_hamming_v2_attention_module_parity(f64):
    """Hamming-distance swinv2 SNN attention A/B against the reference's
    Spiking_BN_WindowAttention3D(version='swinv2').

    NOTE (reference bug): the reference comments out
    ``self.Ham_attn = HammingDistanceAttention()`` in __init__
    (Spiking_swin_transformer3D.py:286) while forward uses it (:336), so
    the swinv2 SNN path CRASHES with AttributeError in the reference as
    shipped — a full-model A/B is impossible. We attach the module the
    forward obviously expects and compare at the attention-module level
    (math: softmax(0.5*(1+(2q-1)(2k-1)^T/d)) * logit_scale
    + 16*sigmoid(cpb), NO outer softmax — :332-358)."""
    import importlib
    import jax
    import_reference_models()
    sw = importlib.import_module(
        "models.STSwinNet_SNN.Spiking_swin_transformer3D")
    torch = f64
    from refharness import sj_functional
    from sdformerflow_tpu.models.common import SpikingConfig
    from sdformerflow_tpu.models.spiking_swin import SpikingBNWindowAttention3D

    dim, nh, ws = 16, 2, (2, 3, 3)
    torch.manual_seed(0)
    tattn = sw.Spiking_BN_WindowAttention3D(
        dim, ws, (0, 0, 0), nh, version="swinv2", qk_scale=None,
        norm="BN", num_steps=ws[0], v_th=0.1, v_reset=None,
        neuron_type="if", surrogate_fun="surrogate.ATan()", tau=2.0,
        detach_reset=True, spike_norm="BN")
    tattn.Ham_attn = sw.HammingDistanceAttention()  # reference-intended fix
    functional = sj_functional()
    functional.reset_net(tattn)
    functional.set_step_mode(tattn, "m")
    tattn.double()
    tattn.eval()
    x_np = np.random.RandomState(9).rand(2, 6, 3, 3, dim) * 2.0
    with torch.no_grad():
        t_out, _ = tattn(torch.from_numpy(x_np))
    t_out = t_out.numpy()

    cfg = SpikingConfig(num_steps=ws[0], v_th=0.1, v_reset=None,
                        neuron_type="if", spike_norm="BN")
    fattn = SpikingBNWindowAttention3D(
        dim=dim, window_size=ws, num_heads=nh, cfg=cfg, version="swinv2",
        qk_scale=None, norm="BN")
    xj = jnp.asarray(x_np)
    variables = fattn.init(jax.random.PRNGKey(0), xj)

    sd = {k: v.numpy() for k, v in tattn.state_dict().items()}

    def branch(name):
        return {"linear": {"kernel": sd[f"linear_{name}.weight"].T},
                "bn": {"BatchNorm_0": {
                    "scale": sd[f"bn_{name}.norm_layer.weight"],
                    "bias": sd[f"bn_{name}.norm_layer.bias"]}}}

    def branch_bs(name):
        return {"bn": {"BatchNorm_0": {
            "mean": sd[f"bn_{name}.norm_layer.running_mean"],
            "var": sd[f"bn_{name}.norm_layer.running_var"]}}}

    P = {"q": branch("q"), "k": branch("k"), "v": branch("v"),
         "logit_scale": sd["logit_scale"],
         "cpb_fc1": {"kernel": sd["cpb_mlp.0.weight"].T,
                     "bias": sd["cpb_mlp.0.bias"]},
         "cpb_fc2": {"kernel": sd["cpb_mlp.2.weight"].T},
         "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
         "proj_bn": {"BatchNorm_0": {
             "scale": sd["proj_bn.norm_layer.weight"],
             "bias": sd["proj_bn.norm_layer.bias"]}}}
    B = {"q": branch_bs("q"), "k": branch_bs("k"), "v": branch_bs("v"),
         "proj_bn": {"BatchNorm_0": {
             "mean": sd["proj_bn.norm_layer.running_mean"],
             "var": sd["proj_bn.norm_layer.running_var"]}}}
    f_out, _ = fattn.apply({"params": P, "batch_stats": B}, xj)
    f_flat = np.asarray(f_out).reshape(t_out.shape)
    rel = np.abs(f_flat - t_out).max() / (np.abs(t_out).max() + 1e-12)
    assert rel < 1e-9, rel
    assert t_out.std() > 1e-3


def test_sdsa_attention_module_parity(f64):
    """SDSA attention (spiked input, unspiked BN output) A/B against the
    reference's own SDSA_WindowAttention3D class
    (Spiking_swin_transformer3D.py:413-492) — not reachable from configs
    (the block's attn_module choice is hardcoded), so module-level."""
    import importlib
    import jax
    import dataclasses
    import_reference_models()
    sw = importlib.import_module(
        "models.STSwinNet_SNN.Spiking_swin_transformer3D")
    torch = f64
    from sdformerflow_tpu.models.common import SpikingConfig
    from sdformerflow_tpu.models.spiking_swin import SpikingBNWindowAttention3D

    dim, nh, ws = 16, 2, (2, 3, 3)
    torch.manual_seed(0)
    tattn = sw.SDSA_WindowAttention3D(
        dim, ws, (0, 0, 0), nh, version="swinv1", qk_scale=0.125,
        norm="BN", num_steps=ws[0], v_th=0.1, v_reset=None,
        neuron_type="if", surrogate_fun="surrogate.ATan()", tau=2.0,
        detach_reset=True, spike_norm="BN")
    from refharness import sj_functional
    functional = sj_functional()
    functional.reset_net(tattn)
    functional.set_step_mode(tattn, "m")
    tattn.double()
    tattn.eval()
    x_np = np.random.RandomState(8).rand(2, 6, 3, 3, dim) * 2.0
    with torch.no_grad():
        t_out, _ = tattn(torch.from_numpy(x_np))
    t_out = t_out.numpy()  # (B_, N, C) raw fold

    cfg = SpikingConfig(num_steps=ws[0], v_th=0.1, v_reset=None,
                        neuron_type="if", spike_norm="BN")
    fattn = SpikingBNWindowAttention3D(
        dim=dim, window_size=ws, num_heads=nh, cfg=cfg, version="swinv1",
        qk_scale=0.125, norm="BN", spike_input=True, spike_output=False)
    xj = jnp.asarray(x_np)
    variables = fattn.init(jax.random.PRNGKey(0), xj)

    # manual key map (module-level; proj_sn feeds the INPUT here)
    sd = {k: v.numpy() for k, v in tattn.state_dict().items()}
    P = {
        "proj_sn_in": {},  # IF has no params
        "q": {"linear": {"kernel": sd["linear_q.weight"].T},
              "bn": {"BatchNorm_0": {
                  "scale": sd["bn_q.norm_layer.weight"],
                  "bias": sd["bn_q.norm_layer.bias"]}}},
        "k": {"linear": {"kernel": sd["linear_k.weight"].T},
              "bn": {"BatchNorm_0": {
                  "scale": sd["bn_k.norm_layer.weight"],
                  "bias": sd["bn_k.norm_layer.bias"]}}},
        "v": {"linear": {"kernel": sd["linear_v.weight"].T},
              "bn": {"BatchNorm_0": {
                  "scale": sd["bn_v.norm_layer.weight"],
                  "bias": sd["bn_v.norm_layer.bias"]}}},
        "relative_position_bias_table":
            sd["relative_position_bias_table"],
        "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
        "proj_bn": {"BatchNorm_0": {
            "scale": sd["proj_bn.norm_layer.weight"],
            "bias": sd["proj_bn.norm_layer.bias"]}},
    }
    B = {
        "q": {"bn": {"BatchNorm_0": {
            "mean": sd["bn_q.norm_layer.running_mean"],
            "var": sd["bn_q.norm_layer.running_var"]}}},
        "k": {"bn": {"BatchNorm_0": {
            "mean": sd["bn_k.norm_layer.running_mean"],
            "var": sd["bn_k.norm_layer.running_var"]}}},
        "v": {"bn": {"BatchNorm_0": {
            "mean": sd["bn_v.norm_layer.running_mean"],
            "var": sd["bn_v.norm_layer.running_var"]}}},
        "proj_bn": {"BatchNorm_0": {
            "mean": sd["proj_bn.norm_layer.running_mean"],
            "var": sd["proj_bn.norm_layer.running_var"]}},
    }
    # drop the IF-empty subtree; flax has no params there
    P.pop("proj_sn_in")
    f_out, _ = fattn.apply({"params": P, "batch_stats": B}, xj)
    # flax returns time-major windows; reference raw-folds to (B_, N, C)
    f_flat = np.asarray(f_out).reshape(t_out.shape)
    rel = np.abs(f_flat - t_out).max() / (np.abs(t_out).max() + 1e-12)
    assert rel < 1e-9, rel
    assert t_out.std() > 1e-3


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


@pytest.mark.parametrize("neuron", ["psn", "if"])
def test_gradient_parity_vs_reference(f64, neuron):
    """TRAINING-path parity: d(loss)/d(params) computed by torch autograd on
    the reference model equals jax.grad on this framework for every
    parameter leaf (via the torch_interop rules map), in f64.

    Exercises the surrogate ATan backward (ops/surrogate.py), detach_reset
    stop-gradients, and the unrolled-time BPTT through stateful neurons —
    observed agreement ~1e-14 on 133/133 leaves."""
    torch = f64
    ref_snn, _ = import_reference_models()
    functional = sj_functional()

    m, s = _snn_cfg("MS_SpikingformerFlowNet_en4", neuron,
                    (1, 1, 1, 1), (2, 2, 4, 4),
                    "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
    torch.manual_seed(0)
    tmodel = ref_snn.MS_SpikingformerFlowNet_en4(m.copy(), s.copy())
    tmodel.init_weights()
    functional.reset_net(tmodel)
    functional.set_step_mode(tmodel, "m")
    tmodel.double()
    tmodel.eval()  # BN running stats; autograd stays active

    x_np = np.random.RandomState(21).rand(1, 10, 2, 96, 96)
    t_loss = (tmodel(torch.from_numpy(x_np))["flow"][-1] ** 2).mean()
    t_loss.backward()

    cfg = {"model": m, "swin_transformer": s, "loader": {}}
    m_cfg, swin, spiking = build_configs(cfg)
    fmodel = get_model(m["name"], m_cfg, swin, spiking)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, bs, _ = TI.convert_state_dict(sd, num_stages=4, max_depth=1,
                                          num_encoders=4)

    def loss_fn(p):
        out = fmodel.apply({"params": p, "batch_stats": bs},
                           jnp.asarray(x_np), False)
        return (out["flow"][-1] ** 2).mean()

    f_loss, f_grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(f_loss) - float(t_loss)) < 1e-9 * (1 + abs(float(t_loss)))

    rules = TI.build_rules(num_stages=4, max_depth=1, num_encoders=4)
    tparams = dict(tmodel.named_parameters())
    n_cmp = 0
    for tkey, coll, fpath, tr in rules:
        if coll != "params" or tkey not in tparams:
            continue
        g_t = tparams[tkey].grad
        if g_t is None:
            continue
        g_t = TI._TRANSFORMS[tr](g_t.numpy())
        node = f_grads
        missing = False
        for part in fpath.split("/"):
            if part not in node:
                missing = True
                break
            node = node[part]
        if missing:
            continue
        g_f = np.asarray(node)
        d = float(np.abs(g_t - g_f).max())
        scale = float(np.abs(g_t).max()) + 1e-30
        assert d <= 1e-10 * scale + 1e-16, (tkey, d, scale)
        n_cmp += 1
    assert n_cmp > 100, f"only {n_cmp} gradient leaves compared"


def test_north_star_aee_parity(f64):
    """The BASELINE.json north star, closed end-to-end: run the reference
    model + the reference's OWN AEE metric (loss/flow_supervised.py:108-149)
    and this framework's model + losses.aee_metrics on identical tensors
    with converted weights; AEE must agree far inside the 1% target."""
    import importlib
    torch = f64
    ref_snn, _ = import_reference_models()
    fs = importlib.import_module("loss.flow_supervised")
    from sdformerflow_tpu import losses as L
    from refharness import sj_functional

    m, s = _snn_cfg("MS_SpikingformerFlowNet_en4", "psn",
                    (1, 1, 1, 1), (2, 2, 4, 4),
                    "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
    functional = sj_functional()
    torch.manual_seed(0)
    tmodel = ref_snn.MS_SpikingformerFlowNet_en4(m.copy(), s.copy())
    tmodel.init_weights()
    functional.reset_net(tmodel)
    functional.set_step_mode(tmodel, "m")
    tmodel.double()
    tmodel.eval()

    rngs = np.random.RandomState(11)
    x_np = rngs.rand(1, 10, 2, 96, 96)
    label = rngs.randn(1, 2, 96, 96) * 3.0
    mask = (rngs.rand(1, 96, 96) > 0.3).astype(np.float64)
    with torch.no_grad():
        t_flow = tmodel(torch.from_numpy(x_np))["flow"][-1]
        t_aee, t_pe1, t_pe2, t_pe3, t_out = fs.AEE(
            t_flow, torch.from_numpy(label), torch.from_numpy(mask),
            flow_scaling=1.0).forward()

    cfg = {"model": m, "swin_transformer": s, "loader": {}}
    m_cfg, swin, spiking = build_configs(cfg)
    fmodel = get_model(m["name"], m_cfg, swin, spiking)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, bs, _ = TI.convert_state_dict(sd, num_stages=4, max_depth=1,
                                          num_encoders=4)
    f_flow = fmodel.apply({"params": params, "batch_stats": bs},
                          jnp.asarray(x_np), False)["flow"][-1]
    f_metrics = L.aee_metrics(f_flow, jnp.asarray(label), jnp.asarray(mask),
                              flow_scaling=1.0)

    t_aee_v = float(t_aee.mean())
    f_aee_v = float(np.asarray(f_metrics["AEE"]).mean())
    assert t_aee_v > 0.1  # non-vacuous
    rel = abs(t_aee_v - f_aee_v) / t_aee_v
    assert rel < 1e-9, f"AEE {f_aee_v} vs reference {t_aee_v} (rel {rel:.2e})"
    for k, tv in (("PE1", t_pe1), ("PE3", t_pe3), ("outlier", t_out)):
        assert abs(float(np.asarray(f_metrics[k])) - float(tv)) < 1e-9


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
