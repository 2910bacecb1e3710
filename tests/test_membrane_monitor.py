"""Membrane-potential monitor (reference vis.monitor_v latent feature,
/root/reference/eval_DSEC_flow_SNN.py:145-149,228-230): neurons expose their
membrane trace via return_v, and SpikingNeuron sows compact per-step
statistics into the intermediates collection when cfg.store_v_seq is set."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models.common import SpikingConfig
from sdformerflow_tpu.models.spiking_layers import SpikingNeuron
from sdformerflow_tpu.ops import neurons


def test_psn_return_v_is_pre_spike_potential():
    T = 4
    x = jax.random.normal(jax.random.PRNGKey(0), (T, 2, 3))
    w = jax.random.normal(jax.random.PRNGKey(1), (T, T))
    b = jnp.arange(T, dtype=jnp.float32).reshape(T, 1)
    spike, h = neurons.psn_neuron(x, w, b, return_v=True)
    exp_h = jnp.tensordot(w, x, axes=((1,), (0,))) + b.reshape(T, 1, 1)
    np.testing.assert_allclose(np.asarray(h), np.asarray(exp_h), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(spike),
                                  np.asarray(exp_h) >= 0)


def test_glif_return_v_matches_spike_path():
    T = 5
    x = jax.random.normal(jax.random.PRNGKey(2), (T, 2, 3))
    params = neurons.glif_init(jax.random.PRNGKey(3), T)
    s_only = neurons.glif_neuron(x, params)
    s, v = neurons.glif_neuron(x, params, return_v=True)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_only))
    assert v.shape == x.shape
    assert np.isfinite(np.asarray(v)).all()


@pytest.mark.parametrize("neuron_type", ["lif", "psn", "glif"])
def test_spiking_neuron_sows_membrane_stats(neuron_type):
    cfg = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type=neuron_type, store_v_seq=True)
    m = SpikingNeuron(cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 2, 8))
    variables = m.init(jax.random.PRNGKey(5), x)
    out, inter = m.apply(variables, x, mutable=["intermediates"])
    assert out.shape == x.shape
    mem = inter["intermediates"]["membrane"][0]
    assert mem.shape == (4, 3)  # (mean, std, max) per timestep
    assert np.isfinite(np.asarray(mem)).all()
    # spike-rate telemetry still present alongside
    assert "spike_rate" in inter["intermediates"]


def test_store_v_seq_off_does_not_sow_membrane():
    cfg = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type="psn")
    m = SpikingNeuron(cfg)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 2, 8))
    variables = m.init(jax.random.PRNGKey(7), x)
    _, inter = m.apply(variables, x, mutable=["intermediates"])
    assert "membrane" not in inter["intermediates"]


def test_outputs_identical_with_and_without_monitor():
    cfg = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type="lif")
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 2, 8))
    m0 = SpikingNeuron(cfg)
    v0 = m0.init(jax.random.PRNGKey(9), x)
    out0 = m0.apply(v0, x)
    m1 = SpikingNeuron(cfg.replace(store_v_seq=True))
    out1, _ = m1.apply(v0, x, mutable=["intermediates"])
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
