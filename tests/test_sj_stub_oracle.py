"""Triangulate the vendored spikingjelly stub against closed-form numpy
oracles (VERDICT r2 #7).

The LIF/IF/PLIF parity chain was stub <-> ops/neurons.py; a shared
misreading of spikingjelly semantics would pass that A/B. These tests pin
the STUB itself to the independent closed-form trace used by
tests/test_neurons.py (which already pins the JAX side), closing the
triangle: oracle == stub == JAX. Also pins the stub's multi-step
seq_to_ann flattening and its multi-step BatchNorm against plain torch.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from refharness import install_stubs  # noqa: E402
from test_neurons import _np_lif_trace  # noqa: E402

install_stubs()
import torch  # noqa: E402
from spikingjelly.activation_based import layer, neuron, surrogate  # noqa: E402


def _run_multistep(node, x_seq):
    node.step_mode = "m"
    with torch.no_grad():
        return node(torch.from_numpy(x_seq)).numpy()


@pytest.mark.parametrize("v_reset", [None, 0.0, 0.3])
@pytest.mark.parametrize("decay_input", [True, False])
def test_stub_lif_matches_closed_form(v_reset, decay_input):
    rng = np.random.RandomState(0)
    x = rng.randn(6, 4, 5).astype(np.float32) * 0.8
    node = neuron.LIFNode(tau=2.0, decay_input=decay_input, v_reset=v_reset,
                          v_threshold=0.7, surrogate_function=surrogate.ATan())
    got = _run_multistep(node, x)
    want = _np_lif_trace(x, v_th=0.7, v_reset=v_reset, tau=2.0,
                         decay_input=decay_input)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("v_reset", [None, 0.0])
def test_stub_if_matches_closed_form(v_reset):
    rng = np.random.RandomState(1)
    x = rng.randn(8, 3, 4).astype(np.float32) * 0.5
    node = neuron.IFNode(v_reset=v_reset, v_threshold=0.4,
                         surrogate_function=surrogate.ATan())
    got = _run_multistep(node, x)
    # IF == LIF with no leak: v <- v + x
    v = np.zeros_like(x[0]) if v_reset is None else np.full_like(x[0], v_reset)
    spikes = []
    for xt in x:
        v = v + xt
        s = (v - 0.4 >= 0).astype(np.float32)
        v = v - s * 0.4 if v_reset is None else (1 - s) * v + s * v_reset
        spikes.append(s)
    np.testing.assert_array_equal(got, np.stack(spikes))


@pytest.mark.parametrize("decay_input", [True, False])
def test_stub_plif_matches_closed_form(decay_input):
    """PLIF at init_tau == closed-form LIF with decay sigmoid(w) == 1/tau."""
    rng = np.random.RandomState(2)
    x = rng.randn(6, 4, 3).astype(np.float32)
    node = neuron.ParametricLIFNode(init_tau=2.0, decay_input=decay_input,
                                    v_reset=None, v_threshold=1.0,
                                    surrogate_function=surrogate.ATan())
    got = _run_multistep(node, x)
    want = _np_lif_trace(x, v_th=1.0, v_reset=None, tau=2.0,
                         decay_input=decay_input)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_stub_multistep_bn_matches_plain_torch():
    """The stub's multi-step layer.BatchNorm2d must equal plain torch BN over
    the (T*B)-flattened batch — train-mode stats update AND eval mode."""
    rng = np.random.RandomState(3)
    T, B, C, H, W = 4, 2, 6, 5, 7
    x = rng.randn(T, B, C, H, W).astype(np.float32)
    bn_stub = layer.BatchNorm2d(C)
    bn_stub.step_mode = "m"
    bn_ref = torch.nn.BatchNorm2d(C)
    bn_ref.load_state_dict({k: v.clone()
                            for k, v in bn_stub.state_dict().items()})
    xt = torch.from_numpy(x)
    # train mode: normalization + running-stat updates must match
    out_s = bn_stub(xt)
    out_r = bn_ref(xt.reshape(T * B, C, H, W)).reshape(T, B, C, H, W)
    np.testing.assert_allclose(out_s.detach().numpy(),
                               out_r.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(bn_stub.running_mean.numpy(),
                               bn_ref.running_mean.numpy(), atol=1e-7)
    np.testing.assert_allclose(bn_stub.running_var.numpy(),
                               bn_ref.running_var.numpy(), atol=1e-7)
    # eval mode on fresh data
    bn_stub.eval()
    bn_ref.eval()
    y = torch.from_numpy(rng.randn(T, B, C, H, W).astype(np.float32))
    np.testing.assert_allclose(
        bn_stub(y).detach().numpy(),
        bn_ref(y.reshape(T * B, C, H, W)).reshape(T, B, C, H, W)
        .detach().numpy(), atol=1e-6)


def test_stub_seq_to_ann_conv_matches_loop():
    """Multi-step layer.Conv2d == per-step plain conv (the [T*B] flatten)."""
    rng = np.random.RandomState(4)
    T, B, C, H, W = 3, 2, 4, 8, 8
    x = torch.from_numpy(rng.randn(T, B, C, H, W).astype(np.float32))
    conv = layer.Conv2d(C, 5, 3, padding=1)
    conv.step_mode = "m"
    with torch.no_grad():
        got = conv(x).numpy()
        ref = torch.nn.functional.conv2d(
            x.reshape(T * B, C, H, W), conv.weight, conv.bias,
            padding=1).reshape(T, B, 5, H, W).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)
