import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.ops import neurons, surrogate

pytestmark = pytest.mark.smoke


def _np_lif_trace(x_seq, v_th, v_reset, tau, decay_input=True):
    """Closed-form numpy LIF reference (SpikingJelly semantics)."""
    v = np.zeros_like(x_seq[0]) if v_reset is None else np.full_like(x_seq[0], v_reset)
    vr = 0.0 if v_reset is None else v_reset
    spikes = []
    for x in x_seq:
        if decay_input:
            v = v + (x - (v - vr)) / tau
        else:
            v = v - (v - vr) / tau + x
        s = (v - v_th >= 0).astype(np.float32)
        if v_reset is None:
            v = v - s * v_th
        else:
            v = (1 - s) * v + s * v_reset
        spikes.append(s)
    return np.stack(spikes)


@pytest.mark.parametrize("v_reset", [None, 0.0, 0.3])
@pytest.mark.parametrize("decay_input", [True, False])
def test_lif_matches_closed_form(v_reset, decay_input):
    rng = np.random.default_rng(0)
    x = rng.normal(0.5, 1.0, size=(7, 3, 4)).astype(np.float32)
    got = neurons.lif_neuron(jnp.asarray(x), v_th=0.5, v_reset=v_reset,
                             tau=2.0, decay_input=decay_input)
    want = _np_lif_trace(x, 0.5, v_reset, 2.0, decay_input)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_if_accumulates():
    x = jnp.full((4, 2), 0.3)
    s = neurons.if_neuron(x, v_th=1.0, v_reset=None)
    # v: 0.3, 0.6, 0.9, 1.2 -> spike only at t=3
    np.testing.assert_array_equal(np.asarray(s),
                                  [[0, 0], [0, 0], [0, 0], [1, 1]])


def test_plif_matches_lif_at_init():
    x = np.random.default_rng(1).normal(0.4, 1.0, (6, 5)).astype(np.float32)
    w = neurons.plif_init_w(2.0)
    got = neurons.plif_neuron(jnp.asarray(x), jnp.asarray(w), v_th=0.5,
                              v_reset=None)
    want = _np_lif_trace(x, 0.5, None, 2.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_psn_matches_manual():
    rng = np.random.default_rng(2)
    T = 5
    x = rng.normal(size=(T, 2, 3)).astype(np.float32)
    w = rng.normal(size=(T, T)).astype(np.float32)
    b = np.full((T, 1), -1.0, np.float32)
    got = neurons.psn_neuron(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    h = w @ x.reshape(T, -1) + b
    want = (h >= 0).astype(np.float32).reshape(x.shape)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_surrogate_gradients():
    # ATan backward: alpha/2 / (1 + (pi/2 * alpha * x)^2)
    g = jax.grad(lambda x: surrogate.atan_spike(x, 2.0))(0.0)
    np.testing.assert_allclose(float(g), 1.0, atol=1e-6)
    g = jax.grad(lambda x: surrogate.atan_spike(x, 2.0))(1.0)
    np.testing.assert_allclose(float(g), 1.0 / (1 + np.pi ** 2), atol=1e-6)
    # heaviside forward is exact
    assert float(surrogate.atan_spike(jnp.asarray(-1e-8))) == 0.0
    assert float(surrogate.atan_spike(jnp.asarray(0.0))) == 1.0


def test_lif_gradient_flows_through_scan():
    x = jnp.ones((4, 3)) * 0.4

    def loss(x):
        return neurons.lif_neuron(x, v_th=0.5, v_reset=None, tau=2.0).sum()

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_sltt_detaches_carry():
    # SLTT gradients must not propagate through the carried membrane: the
    # gradient w.r.t. x[0] of a spike at t=3 should be zero.
    x = jnp.asarray([[0.1], [0.1], [0.1], [2.0]])

    def last_spike(x):
        return neurons.sltt_lif_neuron(x, v_th=0.5, v_reset=None, tau=2.0)[3, 0]

    g = jax.grad(last_spike)(x)
    assert float(g[0, 0]) == 0.0
    assert float(g[3, 0]) != 0.0


def test_glif_shapes_and_range():
    key = jax.random.PRNGKey(0)
    params = neurons.glif_init(key, T=6)
    x = jax.random.normal(key, (6, 2, 3, 3, 4))
    s = neurons.glif_neuron(x, params)
    assert s.shape == x.shape
    assert set(np.unique(np.asarray(s))) <= {0.0, 1.0}
