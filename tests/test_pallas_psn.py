"""Fused Pallas PSN kernel vs the plain jnp reference (interpret mode on
CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdformerflow_tpu.ops import neurons
from sdformerflow_tpu.ops import pallas_psn
from sdformerflow_tpu.ops.surrogate import atan_spike


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # run the kernel in interpreter mode on CPU
    import functools
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def _data(T=10, n=300, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(T, n)).astype(np.float32)
    w = rng.normal(size=(T, T)).astype(np.float32) * 0.3
    b = np.full((T, 1), -0.2, np.float32)
    return jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)


def test_fused_psn_matches_reference_forward():
    x, w, b = _data()
    got = pallas_psn.psn_spike(x, w, b)
    want = neurons.psn_neuron(x, w, b, surrogate_fn=atan_spike)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_psn_gradients_match():
    x, w, b = _data(T=6, n=200, seed=1)

    def loss_fused(x, w, b):
        return (pallas_psn.psn_spike(x, w, b)
                * jnp.arange(x.size).reshape(x.shape)).sum()

    def loss_ref(x, w, b):
        return (neurons.psn_neuron(x, w, b, surrogate_fn=atan_spike)
                * jnp.arange(x.size).reshape(x.shape)).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_fused_affine_folding():
    x, w, b = _data(T=4, n=150, seed=2)
    scale = jnp.asarray(np.random.default_rng(3).uniform(
        0.5, 2.0, (1, 150)).astype(np.float32))
    shift = jnp.asarray(np.random.default_rng(4).normal(
        size=(1, 150)).astype(np.float32))
    got = pallas_psn.fused_affine_psn(x, w, b, scale, shift, 2.0)
    want = neurons.psn_neuron(x * scale + shift, w, b,
                              surrogate_fn=atan_spike)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
