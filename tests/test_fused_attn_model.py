"""Fused QK attention integrated in the flagship model.

- The fused flag must not change the variable tree (same names, shapes AND
  init values): checkpoints trained on the XLA path load directly into the
  fused model.
- A full tiny-flagship eval forward must agree between the paths.
- Non-PSN configs must silently fall back to the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input

def _model(neuron="psn", fused=False, h=24, w=32):
    swin = SwinConfig(
        arc_type="swinv1",
        patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
        input_size=(h, w), patch_size=(1, 1, 2, 2), depths=(1, 1),
        num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 3, 3),
        qk_scale=0.125)
    cfg = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type=neuron, spike_norm="BN",
                        fused_qk_attn=fused)
    return SpikingformerFlowNet(swin=swin, cfg=cfg, num_bins=4,
                                base_num_channels=16, num_encoders=2,
                                use_upsample_conv=False, ms=True)


def _tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)
    fb = jax.tree_util.tree_flatten_with_path(b)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for (pa, la), (pb, lb) in zip(fa[0], fb[0]):
        assert pa == pb
        assert la.shape == lb.shape and la.dtype == lb.dtype, (pa, la, lb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))


def _randomized_vars(model, x, key):
    variables = jax.jit(
        lambda r, z: model.init({"params": r}, z, False))(key, x)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.fold_in(key, 7), len(leaves))
    new = [jnp.asarray(0.4 * jax.random.normal(k, l.shape), l.dtype)
           for k, l in zip(keys, leaves)]
    variables = jax.tree_util.tree_unflatten(treedef, new)
    # positive BN variances
    bs = jax.tree_util.tree_map(lambda a: jnp.abs(a) + 0.25,
                                variables.get("batch_stats", {}))
    return {"params": variables["params"], "batch_stats": bs}


@pytest.mark.smoke
def test_fused_flag_preserves_variable_tree():
    base = _model(fused=False)
    fused = _model(fused=True)
    rng = jax.random.PRNGKey(0)
    x = encode_input(jax.random.normal(rng, (1, 4, 24, 32)))
    vb = jax.jit(lambda r, z: base.init({"params": r}, z, False))(rng, x)
    vf = jax.jit(lambda r, z: fused.init({"params": r}, z, False))(rng, x)
    _tree_equal(vb, vf)


@pytest.mark.full
def test_fused_full_model_forward_matches():
    base = _model(fused=False)
    fused = _model(fused=True)
    rng = jax.random.PRNGKey(1)
    x = encode_input(jax.random.normal(rng, (1, 4, 24, 32)))
    variables = _randomized_vars(base, x, rng)
    out_b = jax.jit(lambda v, z: base.apply(v, z, False)["flow"][-1])(
        variables, x)
    out_f = jax.jit(lambda v, z: fused.apply(v, z, False)["flow"][-1])(
        variables, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_b),
                               rtol=0, atol=1e-4)


def test_fused_train_mode_falls_back_and_matches():
    # train=True must take the XLA path bit-for-bit even with the flag on
    base = _model(fused=False)
    fused = _model(fused=True)
    rng = jax.random.PRNGKey(2)
    x = encode_input(jax.random.normal(rng, (2, 4, 24, 32)))
    variables = _randomized_vars(base, x, rng)

    def run(m):
        out, _ = m.apply(variables, x, True, mutable=["batch_stats"],
                         rngs={"droppath": jax.random.PRNGKey(0)})
        return np.asarray(out["flow"][-1])

    np.testing.assert_array_equal(run(fused), run(base))


def test_fused_non_psn_falls_back():
    base = _model(neuron="lif", fused=False)
    fused = _model(neuron="lif", fused=True)
    rng = jax.random.PRNGKey(3)
    x = encode_input(jax.random.normal(rng, (1, 4, 24, 32)))
    variables = _randomized_vars(base, x, rng)
    out_b = base.apply(variables, x, False)["flow"][-1]
    out_f = fused.apply(variables, x, False)["flow"][-1]
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_b))
