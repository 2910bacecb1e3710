"""Full-model reference A/B with RANDOMIZED parameters and buffers.

The standard refharness A/Bs (test_reference_parity.py) run both frameworks
at torch init — where several parameters are DEGENERATE and can hide
routing/mapping bugs:

- the QK attention positional encodings init to ZEROS
  (/root/reference/models/STSwinNet_SNN/Spiking_swin_transformer3D.py:625),
  so the quirky ``pe.reshape(T, 1, H, W, C)`` placement was never actually
  exercised by a nonzero value;
- BatchNorm inits to scale=1 / bias=0 / mean=0 / var=1 — an identity map, so
  a channel-permuted stats mapping would be invisible;
- near-symmetric neuron time-mix inits (PSN) are invariant under temporal
  relabelings (this exact degeneracy let a WRONG attention re-expression
  pass six f64 A/Bs in round 3 before a LIF config exposed it —
  PERF_NOTES.md "Full-resolution / pair-layout QK attention").

Here every float parameter and running-stat buffer of the torch reference
model is randomized BEFORE conversion, then the converted state must still
match in f64. This pins the full parameter-routing surface — what a real
trained checkpoint exercises.
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

from tests.test_reference_parity import _snn_cfg, f64  # noqa: E402,F401


def _randomize_torch_model(torch, tmodel, seed=7):
    """Perturb every float parameter; randomize BN running stats."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.is_floating_point():
                p.add_(0.3 * torch.randn(p.shape, generator=g,
                                         dtype=p.dtype))
        for name, b in tmodel.named_buffers():
            if not b.is_floating_point():
                continue
            if "running_var" in name:
                b.copy_(0.5 + 1.5 * torch.rand(b.shape, generator=g,
                                               dtype=b.dtype))
            elif "running_mean" in name:
                b.copy_(0.5 * torch.randn(b.shape, generator=g,
                                          dtype=b.dtype))


def _run_ab_randomized(torch, ref_model, model_cfg, swin_cfg, x_np):
    functional = sj_functional()
    torch.manual_seed(0)
    tmodel = ref_model(model_cfg.copy(), swin_cfg.copy())
    tmodel.init_weights()
    functional.reset_net(tmodel)
    functional.set_step_mode(tmodel, "m")
    tmodel.double()
    _randomize_torch_model(torch, tmodel)
    tmodel.eval()
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x_np))
    tflows = [f.numpy() for f in tout["flow"]]

    cfg = {"model": model_cfg, "swin_transformer": swin_cfg, "loader": {}}
    m_cfg, swin, spiking = build_configs(cfg)
    fmodel = get_model(model_cfg["name"], m_cfg, swin, spiking)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    depths = swin.depths
    params, bs, unmatched = TI.convert_state_dict(
        sd, num_stages=len(depths), max_depth=max(depths),
        num_encoders=len(depths), family="snn")
    unmatched = [k for k in unmatched
                 if "relative_position_index" not in k
                 and "relative_coords_table" not in k]
    assert unmatched == [], f"unmatched torch keys: {unmatched[:8]}"

    fout = fmodel.apply({"params": params, "batch_stats": bs},
                        jnp.asarray(x_np), False)
    fflows = [np.asarray(f) for f in fout["flow"]]

    assert len(tflows) == len(fflows)
    for i, (tf, ff) in enumerate(zip(tflows, fflows)):
        assert tf.shape == ff.shape, (i, tf.shape, ff.shape)
        rel = np.abs(tf - ff).max() / (np.abs(tf).max() + 1e-12)
        assert rel < 1e-9, f"scale {i}: rel diff {rel:.3e}"
    assert tflows[-1].std() > 1e-3, "reference produced ~zero flow"


def test_ms_en4_psn_randomized_params_parity(f64):
    """Flagship family with every param/buffer randomized — exercises the
    PE placement (shifted + unshifted QK blocks via the depth-2 stage), BN
    affine/stats routing, and PSN time-mix asymmetry."""
    ref_snn, _ = import_reference_models()
    m, s = _snn_cfg("MS_SpikingformerFlowNet_en4", "psn",
                    (1, 2, 1, 1), (2, 2, 4, 4),
                    "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
    x = np.random.default_rng(0).normal(
        size=(1, 10, 2, 96, 96)).astype(np.float64)
    _run_ab_randomized(f64, ref_snn.MS_SpikingformerFlowNet_en4, m, s, x)


def test_ms_en4_lif_randomized_params_parity(f64):
    """Same family with sequential LIF neurons: order-sensitive state sees
    any temporal-pairing mismatch a near-symmetric PSN matrix could mask."""
    ref_snn, _ = import_reference_models()
    m, s = _snn_cfg("MS_SpikingformerFlowNet_en4", "lif",
                    (1, 2, 1, 1), (2, 2, 4, 4),
                    "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
    x = np.random.default_rng(1).normal(
        size=(1, 10, 2, 96, 96)).astype(np.float64)
    _run_ab_randomized(f64, ref_snn.MS_SpikingformerFlowNet_en4, m, s, x)
