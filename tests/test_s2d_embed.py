"""Space-to-depth embed re-expression (ops/s2d.py + training/s2d_embed.py):
the s2d model + rearranged variables must reproduce the normal eval forward
exactly (f64) on the flagship MSPED conv-sfn embed — standalone and composed
with BN folding — and the kernel transforms must equal the original convs on
random tensors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.ops.s2d import (depth_to_space, s2d_kernel_s1,
                                      s2d_kernel_s2, space_to_depth)
from sdformerflow_tpu.training.bn_folding import fold_model_and_variables
from sdformerflow_tpu.training.s2d_embed import s2d_model_and_variables
from tests.test_bn_folding import _perturb_stats, _swin


def _conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_space_to_depth_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 2, 8, 12, 5)))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))),
                                  np.asarray(x))


def test_s2d_kernel_s1_matches_stride1_conv():
    with jax.enable_x64(True):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 12, 16, 3)))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 5)))
        want = space_to_depth(_conv(x, w, 1, ((1, 1), (1, 1))))
        got = _conv(space_to_depth(x), s2d_kernel_s1(w), 1, ((1, 1), (1, 1)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)


def test_s2d_kernel_s2_matches_stride2_conv():
    with jax.enable_x64(True):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 12, 16, 4)))
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)))
        want = _conv(x, w, 2, ((1, 1), (1, 1)))
        got = _conv(space_to_depth(x), s2d_kernel_s2(w), 1, ((1, 0), (1, 0)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)


def _flagship(h, w, neuron="psn"):
    cfg = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type=neuron, spike_norm="BN")
    return SpikingformerFlowNet(
        swin=_swin(h, w), cfg=cfg, num_bins=4, base_num_channels=16,
        num_encoders=2, use_upsample_conv=False, ms=True)


def _check_s2d(model, x, seed=1, fold_first=False, atol=1e-9):
    with jax.enable_x64(True):
        x = x.astype(jnp.float64)
        variables = model.init({"params": jax.random.PRNGKey(seed)}, x, False)
        variables = _perturb_stats(variables, seed)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), variables)
        want = model.apply(variables, x, False)["flow"]
        if fold_first:
            model, variables = fold_model_and_variables(model, variables)
        model_s, vars_s = s2d_model_and_variables(model, variables)
        got = model_s.apply(vars_s, x, False)["flow"]
        assert len(got) == len(want)
        for g, wv in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                       atol=atol, rtol=1e-9)
        assert float(sum(jnp.abs(wv).sum() for wv in want)) > 0


@pytest.mark.parametrize("neuron", ["psn", "lif"])
def test_s2d_full_model_parity(neuron):
    h, w = 24, 24
    model = _flagship(h, w, neuron)
    x = encode_input(jax.random.normal(jax.random.PRNGKey(0), (1, 4, h, w)))
    _check_s2d(model, x)


def test_s2d_composes_with_bn_folding():
    h, w = 24, 24
    model = _flagship(h, w)
    x = encode_input(jax.random.normal(jax.random.PRNGKey(3), (1, 4, h, w)))
    _check_s2d(model, x, seed=4, fold_first=True)


def test_s2d_train_mode_raises():
    h, w = 16, 16
    model = _flagship(h, w)
    x = encode_input(jax.random.normal(jax.random.PRNGKey(5), (1, 4, h, w)))
    variables = model.init({"params": jax.random.PRNGKey(6)}, x, False)
    model_s, vars_s = s2d_model_and_variables(model, variables)
    with pytest.raises(ValueError, match="inference-only"):
        model_s.apply(vars_s, x, True,
                      rngs={"droppath": jax.random.PRNGKey(7)},
                      mutable=["batch_stats"])
