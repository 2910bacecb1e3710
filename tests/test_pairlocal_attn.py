"""Pair-local attention re-expression (cfg.pairlocal_attn): TRAIN-capable
twin of the raw-refold QK attention.

Must match the base path EXACTLY (f64): eval forward, train forward,
per-leaf gradients, and mutated BN running stats — the re-expression
relabels fold layouts without changing any computed value (module header in
models/spiking_swin.py), so this is a bit-parity surface, not a tolerance
one. Params randomized per the PERF_NOTES round-3 degeneracy warning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.losses import flow_loss_supervised
from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input


def _model(neuron="psn", pairlocal=False, h=24, w=32):
    swin = SwinConfig(
        arc_type="swinv1",
        patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
        input_size=(h, w), patch_size=(1, 1, 2, 2), depths=(1, 1),
        num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 3, 3),
        qk_scale=0.125)
    cfg = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type=neuron, spike_norm="BN",
                        pairlocal_attn=pairlocal)
    return SpikingformerFlowNet(swin=swin, cfg=cfg, num_bins=4,
                                base_num_channels=16, num_encoders=2,
                                use_upsample_conv=False, ms=True)


def _randomized_vars(model, x, key, dtype):
    variables = jax.jit(
        lambda r, z: model.init({"params": r}, z, False))(key, x)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.fold_in(key, 7), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(0.4 * jax.random.normal(k, l.shape), dtype)
                  for k, l in zip(keys, leaves)])
    bs = jax.tree_util.tree_map(lambda a: jnp.abs(a) + 0.25,
                                variables.get("batch_stats", {}))
    return {"params": variables["params"], "batch_stats": bs}


def _leaves(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict) or hasattr(v, "keys"):
            out.update(_leaves(v, p))
        else:
            out[p] = np.asarray(v)
    return out


@pytest.mark.parametrize("neuron", ["psn", "lif"])
def test_pairlocal_eval_forward_bit_matches(neuron):
    with jax.enable_x64(True):
        base = _model(neuron=neuron)
        plm = _model(neuron=neuron, pairlocal=True)
        rng = jax.random.PRNGKey(0)
        x = encode_input(
            jax.random.normal(rng, (2, 4, 24, 32), jnp.float64))
        variables = _randomized_vars(base, x, rng, jnp.float64)
        out_b = base.apply(variables, x, False)["flow"][-1]
        out_p = plm.apply(variables, x, False)["flow"][-1]
        np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_b))


def test_pairlocal_train_grads_and_stats_bit_match():
    with jax.enable_x64(True):
        base = _model()
        plm = _model(pairlocal=True)
        rng = jax.random.PRNGKey(1)
        x = encode_input(
            jax.random.normal(rng, (2, 4, 24, 32), jnp.float64))
        variables = _randomized_vars(base, x, rng, jnp.float64)
        label = jax.random.normal(jax.random.fold_in(rng, 2),
                                  (2, 2, 24, 32), jnp.float64)
        mask = jnp.ones((2, 1, 24, 32), jnp.float64)

        def run(m):
            def loss_fn(params):
                out, mut = m.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, True, mutable=["batch_stats"],
                    rngs={"droppath": jax.random.PRNGKey(0)})
                flows = [f.astype(jnp.float64) for f in out["flow"]]
                return flow_loss_supervised(flows, label, mask), mut

            (loss, mut), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(variables["params"])
            return float(loss), grads, mut["batch_stats"]

        lb, gb, sb = run(base)
        lp, gp, sp = run(plm)
        assert lb == lp, (lb, lp)
        wb, wp = _leaves(gb), _leaves(gp)
        assert set(wb) == set(wp)
        for k in sorted(wb):
            np.testing.assert_array_equal(wp[k], wb[k], err_msg=f"grad {k}")
        tb, tp = _leaves(sb), _leaves(sp)
        assert set(tb) == set(tp) and len(tb) > 0
        for k in sorted(tb):
            np.testing.assert_array_equal(tp[k], tb[k], err_msg=f"stat {k}")


@pytest.mark.smoke
def test_pairlocal_preserves_variable_tree():
    base = _model()
    plm = _model(pairlocal=True)
    rng = jax.random.PRNGKey(0)
    x = encode_input(jax.random.normal(rng, (1, 4, 24, 32)))
    vb = jax.jit(lambda r, z: base.init({"params": r}, z, False))(rng, x)
    vp = jax.jit(lambda r, z: plm.init({"params": r}, z, False))(rng, x)
    assert (jax.tree_util.tree_structure(vb)
            == jax.tree_util.tree_structure(vp))
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(vb)[0],
            jax.tree_util.tree_flatten_with_path(vp)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))
