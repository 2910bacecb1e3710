"""Train-capable space-to-depth embed re-expression (cfg.s2d_train).

Unlike the eval-only ``cfg.s2d_embed`` transform (which rearranges stored
variables), ``s2d_train`` keeps REFERENCE-SHAPED parameters and expands them
to block space inside apply, re-reducing BN batch statistics across the 4
equal-count block positions — so the variable tree is identical to the base
model and training itself is an exact re-expression. The base path carries
the f64 reference parity (tests/test_train_step_parity.py,
test_reference_parity*.py); equality against the base path here is therefore
transitively equality against the reference
(/root/reference/models/STSwinNet_SNN/Spiking_modules.py:1710-1837 under
train_flow_parallel_supervised_SNN.py:299-336).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.training.optim import build_optimizer
from sdformerflow_tpu.training.train_step import (create_train_state,
                                                  make_train_step)
from tests.test_bn_folding import _perturb_stats, _swin


def _flagship(h, w, neuron="psn", s2d_train=False):
    cfg = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type=neuron, spike_norm="BN",
                        s2d_train=s2d_train)
    return SpikingformerFlowNet(
        swin=_swin(h, w), cfg=cfg, num_bins=4, base_num_channels=16,
        num_encoders=2, use_upsample_conv=False, ms=True)


def _tree_paths(tree, prefix=""):
    out = {}
    for k in sorted(tree.keys()):
        p = f"{prefix}/{k}" if prefix else str(k)
        v = tree[k]
        if hasattr(v, "keys"):
            out.update(_tree_paths(v, p))
        else:
            out[p] = v
    return out


def test_s2d_train_variable_tree_identical():
    """Same init RNG -> identical tree structure, shapes AND values: the
    s2d_train model interoperates with base-model checkpoints/opt state
    with no conversion."""
    h, w = 24, 24
    # under x64: an initializer without an explicit f32 param dtype would
    # draw different values from the same key (found by the trajectory A/B)
    with jax.enable_x64(True):
        x = encode_input(jax.random.normal(
            jax.random.PRNGKey(0), (1, 4, h, w)))
        v_base = _flagship(h, w).init({"params": jax.random.PRNGKey(1)},
                                      x, False)
        v_s2d = _flagship(h, w, s2d_train=True).init(
            {"params": jax.random.PRNGKey(1)}, x, False)
    pb, ps = _tree_paths(v_base), _tree_paths(v_s2d)
    assert set(pb) == set(ps)
    for k in pb:
        assert pb[k].shape == ps[k].shape, k
        np.testing.assert_array_equal(np.asarray(pb[k]), np.asarray(ps[k]),
                                      err_msg=k)


@pytest.mark.parametrize("neuron", ["psn", "lif"])
def test_s2d_train_eval_forward_parity(neuron):
    h, w = 24, 24
    model = _flagship(h, w, neuron)
    model_s = _flagship(h, w, neuron, s2d_train=True)
    with jax.enable_x64(True):
        x = encode_input(jax.random.normal(
            jax.random.PRNGKey(0), (1, 4, h, w))).astype(jnp.float64)
        variables = model.init({"params": jax.random.PRNGKey(1)}, x, False)
        variables = _perturb_stats(variables, 1)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), variables)
        want = model.apply(variables, x, False)["flow"]
        got = model_s.apply(variables, x, False)["flow"]
        for g, wv in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                       atol=1e-9, rtol=1e-9)
        assert float(sum(jnp.abs(wv).sum() for wv in want)) > 0


def test_s2d_train_forward_and_stats_parity():
    """Train-mode forward: flows AND mutated BN running stats match the base
    path in f64 (the block moment re-reduction is exact)."""
    h, w = 24, 24
    model = _flagship(h, w)
    model_s = _flagship(h, w, s2d_train=True)
    with jax.enable_x64(True):
        x = encode_input(jax.random.normal(
            jax.random.PRNGKey(2), (2, 4, h, w))).astype(jnp.float64)
        variables = model.init({"params": jax.random.PRNGKey(3)}, x, False)
        variables = _perturb_stats(variables, 3)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), variables)
        rngs = {"droppath": jax.random.PRNGKey(4)}
        want, mut_w = model.apply(variables, x, True,
                                  mutable=["batch_stats"], rngs=rngs)
        got, mut_g = model_s.apply(variables, x, True,
                                   mutable=["batch_stats"], rngs=rngs)
        for g, wv in zip(got["flow"], want["flow"]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                       atol=1e-9, rtol=1e-9)
        pw = _tree_paths(mut_w["batch_stats"])
        pg = _tree_paths(mut_g["batch_stats"])
        assert set(pw) == set(pg)
        for k in pw:
            np.testing.assert_allclose(np.asarray(pg[k]), np.asarray(pw[k]),
                                       atol=1e-11, rtol=1e-11, err_msg=k)


def test_s2d_train_trajectory_parity():
    """Multi-step TRAIN trajectory (forward -> loss -> backward -> clip ->
    AdamW update -> repeat) in f64: post-trajectory params, BN running stats
    and per-step losses match the base path per leaf. Same harness shape as
    tests/test_train_step_parity.py, A side = base path (reference-parity
    anchored), B side = s2d_train."""
    h, w = 24, 24
    n_steps = 3
    rng = np.random.RandomState(7)
    batches = [{
        "chunk": jnp.asarray(rng.randn(2, 4, h, w)),
        "label": jnp.asarray(rng.randn(2, 2, h, w)),
        "mask": jnp.asarray((rng.rand(2, 1, h, w) > 0.3).astype(np.float64)),
    } for _ in range(n_steps)]

    def run(s2d_train):
        model = _flagship(h, w, s2d_train=s2d_train)
        tx = build_optimizer(lr=1e-3, steps_per_epoch=10, clip_grad=100.0)
        with jax.enable_x64(True):
            sample = encode_input(batches[0]["chunk"]).astype(jnp.float64)
            state = create_train_state(model, tx, sample,
                                       jax.random.PRNGKey(11))
            state = jax.tree_util.tree_map(
                lambda a: (a.astype(jnp.float64)
                           if (hasattr(a, "dtype")
                               and jnp.issubdtype(a.dtype, jnp.floating))
                           else a),
                state)
            step = make_train_step(donate=False)
            losses = []
            for i, b in enumerate(batches):
                b = {k: v.astype(jnp.float64) if v.dtype != jnp.int32 else v
                     for k, v in b.items()}
                state, m = step(state, b, jax.random.PRNGKey(100 + i))
                losses.append(float(m["loss"]))
            return state, losses

    state_a, loss_a = run(False)
    state_b, loss_b = run(True)
    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-9)
    for name, ta, tb in (("params", state_a.params, state_b.params),
                         ("stats", state_a.batch_stats, state_b.batch_stats)):
        pa, pb = _tree_paths(ta), _tree_paths(tb)
        assert set(pa) == set(pb)
        for k in pa:
            np.testing.assert_allclose(np.asarray(pb[k]), np.asarray(pa[k]),
                                       atol=1e-9, rtol=1e-7,
                                       err_msg=f"{name}:{k}")


def test_s2d_train_excludes_s2d_embed():
    h, w = 16, 16
    cfg = SpikingConfig(num_steps=4, v_th=0.1, neuron_type="psn",
                        spike_norm="BN", s2d_train=True, s2d_embed=True)
    model = SpikingformerFlowNet(
        swin=_swin(h, w), cfg=cfg, num_bins=4, base_num_channels=16,
        num_encoders=2, use_upsample_conv=False, ms=True)
    x = encode_input(jax.random.normal(jax.random.PRNGKey(0), (1, 4, h, w)))
    with pytest.raises(ValueError, match="mutually exclusive"):
        model.init({"params": jax.random.PRNGKey(1)}, x, False)
