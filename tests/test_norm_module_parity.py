"""Norm-zoo module A/B vs the reference's own SpikingNormLayer
(Spiking_modules.py:101-146) — closes VERDICT r2 #9's norm-path item:
BNTT (per-timestep BNs, eps 1e-4), TDBN (alpha*v_th scale init), GN/IN/LN
group norms, and BN_notrack, in eval AND train mode where stats exist.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from refharness import install_stubs, REFERENCE_ROOT  # noqa: E402

install_stubs()
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)
import torch  # noqa: E402
import models.STSwinNet_SNN.Spiking_modules as ref_mod  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdformerflow_tpu.models.spiking_layers import SpikingNorm  # noqa: E402

pytestmark = pytest.mark.smoke


def _to_torch(x_tbhwc):
    # [T, B, H, W, C] -> [T, B, C, H, W]
    return torch.from_numpy(np.ascontiguousarray(
        x_tbhwc.transpose(0, 1, 4, 2, 3)))


def _from_torch(t):
    return t.detach().numpy().transpose(0, 1, 3, 4, 2)


def _convert_norm_params(norm, tmodel, T, C):
    """torch SpikingNormLayer state_dict -> SpikingNorm variables."""
    # .copy() is essential: .numpy() VIEWS share memory with the torch
    # buffers, and a train-mode forward mutates running stats in place
    sd = {k: v.detach().numpy().copy()
          for k, v in tmodel.state_dict().items()}
    params, stats = {}, {}
    if norm in ("BN", "TDBN"):
        params["BatchNorm_0"] = {"scale": sd["norm_layer.weight"],
                                 "bias": sd["norm_layer.bias"]}
        stats["BatchNorm_0"] = {"mean": sd["norm_layer.running_mean"],
                                "var": sd["norm_layer.running_var"]}
    elif norm == "BNTT":
        for i in range(T):
            params[f"bn_t{i}"] = {"scale": sd[f"norm_layer.{i}.weight"],
                                  "bias": sd[f"norm_layer.{i}.bias"]}
            stats[f"bn_t{i}"] = {
                "mean": sd[f"norm_layer.{i}.running_mean"],
                "var": sd[f"norm_layer.{i}.running_var"]}
    elif norm in ("GN", "IN", "LN"):
        params["GroupNorm_0"] = {"scale": sd["norm_layer.weight"],
                                 "bias": sd["norm_layer.bias"]}
    elif norm == "BN_notrack":
        params = {"scale": sd["norm_layer.weight"],
                  "bias": sd["norm_layer.bias"]}
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("norm", ["BN", "TDBN", "BNTT", "GN", "IN", "LN",
                                  "BN_notrack"])
@pytest.mark.parametrize("train", [False, True])
def test_spiking_norm_layer_parity(norm, train):
    if norm in ("GN", "IN", "LN", "BN_notrack") and train:
        pytest.skip("stat-free norms have no train/eval distinction")
    rng = np.random.RandomState(7)
    T, B, C, H, W = 4, 2, 32, 6, 8
    v_th = 0.3
    x = rng.randn(T, B, H, W, C).astype(np.float64)

    torch.manual_seed(0)
    tmodel = ref_mod.SpikingNormLayer(C, T, norm=norm, v_th=v_th).double()
    # randomize affine + running stats so the comparison is non-trivial
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            p.add_(torch.from_numpy(
                rng.uniform(-0.3, 0.3, p.shape)))
        for name, b in tmodel.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.from_numpy(rng.uniform(0.5, 2.0, b.shape)))
            elif name.endswith("running_mean"):
                b.copy_(torch.from_numpy(rng.uniform(-0.5, 0.5, b.shape)))
    for m in tmodel.modules():
        if hasattr(m, "step_mode"):
            m.step_mode = "m"
    tmodel.train(train)
    # capture the PRE-forward state: a train-mode torch forward mutates the
    # running stats in place
    variables = _convert_norm_params(norm, tmodel, T, C)
    with torch.no_grad():
        want = _from_torch(tmodel(_to_torch(x)))

    fmodel = SpikingNorm(C, T, norm, v_th)
    with jax.enable_x64(True):
        if train and norm in ("BN", "TDBN", "BNTT"):
            got, mutated = fmodel.apply(
                jax.tree_util.tree_map(jnp.asarray, variables),
                jnp.asarray(x), True, mutable=["batch_stats"])
            # updated running stats must match torch's momentum update
            t_sd = {k: v.detach().numpy()
                    for k, v in tmodel.state_dict().items()}
            ref_stats = _convert_norm_params(norm, tmodel, T, C)
            flat_w = jax.tree_util.tree_leaves(ref_stats["batch_stats"])
            flat_g = jax.tree_util.tree_leaves(mutated["batch_stats"])
            for wv, gv in zip(flat_w, flat_g):
                np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                                           rtol=1e-9, atol=1e-12)
        else:
            got = fmodel.apply(
                jax.tree_util.tree_map(jnp.asarray, variables),
                jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-10)
    assert np.abs(want).sum() > 0
