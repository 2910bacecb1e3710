"""Eval-time BN folding (training/bn_folding.py): the folded model + folded
variables must reproduce the unfolded eval forward exactly (f64) across the
layer zoo — including attention/MLP linears, patch merging, resblocks, patch
embeds (PED), and decoders — for BN and TDBN; GN configs are a no-op.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import (SpikingformerFlowNet,
                                                 SpikingMultiResUNetFlow)
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.training.bn_folding import (fold_bn_variables,
                                                  fold_model_and_variables)


def _perturb_stats(variables, seed=0):
    """Randomize batch_stats + BN affine params so folding is non-vacuous
    (init stats are mean=0/var=1 which fold trivially)."""
    rng = np.random.default_rng(seed)

    def ptree(tree, in_stats):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = ptree(v, in_stats or k in ("mean", "var"))
            else:
                arr = np.asarray(v)
                if k == "var":
                    out[k] = jnp.asarray(
                        0.2 + rng.uniform(0.1, 2.0, arr.shape), arr.dtype)
                elif k == "mean":
                    out[k] = jnp.asarray(rng.normal(0, 0.5, arr.shape),
                                         arr.dtype)
                else:
                    out[k] = v
        return out

    def pparams(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = pparams(v)
            elif k in ("scale", "bias"):
                arr = np.asarray(v)
                out[k] = jnp.asarray(arr + rng.normal(0, 0.2, arr.shape),
                                     arr.dtype)
            else:
                out[k] = v
        return out

    return {"params": pparams(variables["params"]),
            "batch_stats": ptree(variables.get("batch_stats", {}), True)}


def _swin(h, w, **kw):
    base = dict(arc_type="swinv1",
                patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
                input_size=(h, w), patch_size=(1, 1, 2, 2), depths=(1, 1),
                num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 3, 3),
                qk_scale=0.125)
    base.update(kw)
    return SwinConfig(**base)


def _check(model, x, seed=1, atol=1e-9):
    with jax.enable_x64(True):
        x = x.astype(jnp.float64)
        variables = model.init({"params": jax.random.PRNGKey(seed)}, x, False)
        variables = _perturb_stats(variables, seed)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), variables)
        want = model.apply(variables, x, False)["flow"]
        model_f, vars_f = fold_model_and_variables(model, variables)
        got = model_f.apply(vars_f, x, False)["flow"]
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=atol, rtol=1e-9)
        assert float(sum(jnp.abs(w).sum() for w in want)) > 0


@pytest.mark.parametrize("ms,neuron", [(True, "psn"), (False, "lif")])
def test_fold_spikingformer_flownet(ms, neuron):
    h, w = 24, 24
    cfg = SpikingConfig(num_steps=4, v_th=0.1 if ms else 1.0,
                        v_reset=None, neuron_type=neuron, spike_norm="BN")
    embed = ("MS_PED_Spiking_PatchEmbed_Conv_sfn" if ms
             else "Spiking_PatchEmbed_Conv_sfn")
    model = SpikingformerFlowNet(
        swin=_swin(h, w, patch_embed_type=embed), cfg=cfg, num_bins=4,
        base_num_channels=16, num_encoders=2, use_upsample_conv=False, ms=ms)
    x = encode_input(jax.random.normal(jax.random.PRNGKey(0), (1, 4, h, w)))
    _check(model, x)


def test_fold_tdbn():
    h, w = 24, 24
    cfg = SpikingConfig(num_steps=4, v_th=0.5, neuron_type="lif",
                        spike_norm="TDBN")
    model = SpikingformerFlowNet(
        swin=_swin(h, w, patch_embed_type="Spiking_PatchEmbed_Conv_sfn"),
        cfg=cfg, num_bins=4, base_num_channels=16, num_encoders=2,
        use_upsample_conv=False, ms=False)
    x = encode_input(jax.random.normal(jax.random.PRNGKey(2), (1, 4, h, w)))
    _check(model, x, seed=3)


def test_fold_conv_unet_with_upsample_decoders():
    cfg = SpikingConfig(num_steps=4, v_th=1.0, neuron_type="lif",
                        spike_norm="BN")
    model = SpikingMultiResUNetFlow(cfg=cfg, num_bins=4,
                                    base_num_channels=8, num_encoders=3,
                                    use_upsample_conv=True, input_sfn=True,
                                    ms=False)
    x = encode_input(jax.random.normal(jax.random.PRNGKey(4), (2, 4, 32, 32)))
    _check(model, x, seed=5)


def test_fold_gn_keeps_groupnorms():
    """GN itself is not foldable (data-dependent statistics): the GN modules
    and their params must survive the fold, while the plain-BN sites a GN
    config still contains (resblock literal-"BN" quirk, patch-embed
    TorchBatchNorm) fold away — and the outputs stay equal."""
    cfg = SpikingConfig(num_steps=4, v_th=1.0, neuron_type="lif",
                        spike_norm="GN")
    model = SpikingMultiResUNetFlow(cfg=cfg, num_bins=4,
                                    base_num_channels=8, num_encoders=2,
                                    use_upsample_conv=False, ms=True)
    x = encode_input(jax.random.normal(jax.random.PRNGKey(6), (1, 4, 16, 16)))
    variables = model.init({"params": jax.random.PRNGKey(7)}, x, False)
    folded = fold_bn_variables(variables)

    def count_gn(tree):
        n = 0
        for k, v in tree.items():
            if isinstance(v, dict):
                n += (k == "GroupNorm_0") + count_gn(v)
        return n

    assert count_gn(folded["params"]) == count_gn(variables["params"]) > 0
    assert not folded["batch_stats"]  # every running-stats BN folded away
    model_f, vars_f = fold_model_and_variables(model, variables)
    w = model.apply(variables, x, False)["flow"][-1]
    g = model_f.apply(vars_f, x, False)["flow"][-1]
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)
