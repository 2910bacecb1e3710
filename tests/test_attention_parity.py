"""Parity tests for the spiking window attention's shape gymnastics.

The reference folds the SNN time axis into window-batch/token axes with raw
``view``/``reshape`` calls (row-major reinterpretation, NOT semantic
transposes). These tests verify jnp.reshape reproduces torch's element
mapping exactly, and re-derive the QK attention data path in plain numpy
with a simple IF neuron to check the full fold/spike/unfold pipeline.
"""

import numpy as np
import jax.numpy as jnp
import torch

from sdformerflow_tpu.models.common import SpikingConfig
from sdformerflow_tpu.models.spiking_swin import SpikingQKWindowAttention3D
from sdformerflow_tpu.ops.windows import window_partition_v2


def test_raw_reshape_matches_torch_view():
    """(T, B_, H, W, C) -> (B_, nh, N, hd) raw fold: torch vs jnp."""
    T, B_, H, W, C, nh = 2, 3, 4, 5, 6, 2
    x = np.arange(T * B_ * H * W * C, dtype=np.float32).reshape(T, B_, H, W, C)
    want = torch.from_numpy(x).reshape(B_, nh, -1, C // nh).numpy()
    got = np.asarray(jnp.asarray(x).reshape(B_, nh, -1, C // nh))
    np.testing.assert_array_equal(got, want)
    # and the (T, B_, nh, HW, hd) variant used for q
    want_q = torch.from_numpy(x).reshape(T, B_, nh, -1, C // nh).numpy()
    got_q = np.asarray(jnp.asarray(x).reshape(T, B_, nh, -1, C // nh))
    np.testing.assert_array_equal(got_q, want_q)


def test_attn_unfold_matches_torch():
    """(B_, nh, N, hd) -> reshape(B_, nh, T, H, W, hd) -> permute ->
    (T, B_, H, W, C): torch vs jnp."""
    T, B_, H, W, C, nh = 2, 3, 4, 5, 6, 2
    hd = C // nh
    a = np.arange(B_ * nh * T * H * W * hd, dtype=np.float32).reshape(
        B_, nh, T * H * W, hd)
    want = (torch.from_numpy(a).reshape(B_, nh, T, H, W, hd)
            .permute(2, 0, 3, 4, 1, 5).reshape(T, B_, H, W, C).numpy())
    got = np.asarray(jnp.asarray(a).reshape(B_, nh, T, H, W, hd)
                     .transpose(2, 0, 3, 4, 1, 5).reshape(T, B_, H, W, C))
    np.testing.assert_array_equal(got, want)


def test_window_partition_v2_matches_torch_reference_impl():
    B, D, H, W, C = 2, 4, 6, 6, 3
    ws = (2, 3, 3)
    x = np.random.default_rng(0).normal(size=(B, D, H, W, C)).astype(
        np.float32)
    xt = torch.from_numpy(x)
    # reference impl (Spiking_swin_transformer3D.py:100-113)
    ref = (xt.view(B, D // ws[0], ws[0], H // ws[1], ws[1], W // ws[2],
                   ws[2], C)
           .permute(0, 1, 3, 5, 2, 4, 6, 7).contiguous()
           .view(ws[0], -1, ws[1], ws[2], C).numpy())
    got = np.asarray(window_partition_v2(jnp.asarray(x), ws))
    np.testing.assert_array_equal(got, ref)


def test_qk_attention_numpy_rederivation():
    """Run the flax QK attention with an IF neuron and compare against an
    independent numpy re-derivation of the same math."""
    import jax

    T, B_, H, W, C, nh = 2, 2, 3, 3, 8, 2
    hd = C // nh
    cfg = SpikingConfig(num_steps=T, v_th=0.5, v_reset=None,
                        neuron_type="if", spike_norm=None)
    attn = SpikingQKWindowAttention3D(dim=C, window_size=(T, H, W),
                                      num_heads=nh, cfg=cfg, norm=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (T, B_, H, W, C))
    variables = attn.init(jax.random.PRNGKey(1), x)
    out, _ = attn.apply(variables, x)

    # numpy re-derivation
    p = variables["params"]
    wq = np.asarray(p["q"]["linear"]["kernel"])
    wk = np.asarray(p["k"]["linear"]["kernel"])
    pe = np.asarray(p["k"]["positional_encoding"])
    wp = np.asarray(p["proj"]["kernel"])
    bp = np.asarray(p["proj"]["bias"])

    def if_neuron_np(seq, v_th=0.5):
        v = np.zeros_like(seq[0])
        outs = []
        for s in seq:
            v = v + s
            spike = (v - v_th >= 0).astype(np.float32)
            v = v - spike * v_th
            outs.append(spike)
        return np.stack(outs)

    xs = if_neuron_np(np.asarray(x))           # proj_sn
    q = if_neuron_np(xs @ wq)                  # sn_q
    k = if_neuron_np(xs @ wk + pe.reshape(T, 1, H, W, C))  # pe pre-spike
    q = q.reshape(T, B_, nh, -1, hd)
    k = k.reshape(B_, nh, -1, hd)
    att_token = if_neuron_np(q.sum(-1, keepdims=True))
    a = k * att_token.reshape(B_, nh, -1, 1)
    a = a.reshape(B_, nh, T, H, W, hd).transpose(2, 0, 3, 4, 1, 5)
    a = a.reshape(T, B_, H, W, C)
    want = a @ wp + bp  # attention now returns time-major [T, B_, H, W, C]

    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
