"""Numeric parity of the ANN swin-v1 window attention against a direct torch
implementation of the reference math (STswin_transformer.py:135-167):
fused qkv, scaled q @ k^T + relative-position bias, shift mask, softmax,
attn @ v, output projection — with weights shared between frameworks."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from sdformerflow_tpu.models.ann_swin import WindowAttention3D
from sdformerflow_tpu.ops.windows import relative_position_index


def _torch_v1_attention(x, wqkv, bqkv, wproj, bproj, table, window_size,
                        num_heads, mask=None):
    B_, N, C = x.shape
    nh, hd = num_heads, C // num_heads
    qkv = x @ wqkv.T + bqkv
    qkv = qkv.reshape(B_, N, 3, nh, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (hd ** -0.5)
    attn = q @ k.transpose(-2, -1)
    idx = torch.from_numpy(
        np.asarray(relative_position_index(window_size)))
    bias = table[idx[:N, :N].reshape(-1)].reshape(N, N, nh)
    attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.view(B_ // nW, nW, nh, N, N) + mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, nh, N, N)
    attn = torch.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
    return out @ wproj.T + bproj


def test_ann_v1_attention_matches_torch():
    window = (2, 3, 3)
    N = 2 * 3 * 3
    C, nh, B_ = 8, 2, 4
    attn_mod = WindowAttention3D(dim=C, window_size=window, num_heads=nh,
                                 version="swinv1", qkv_bias=True,
                                 qk_scale=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (B_, N, C))
    variables = attn_mod.init(jax.random.PRNGKey(1), x)
    # shared shift mask (2 windows pattern)
    mask = np.zeros((2, N, N), np.float32)
    mask[1, : N // 2, N // 2:] = -100.0
    mask[1, N // 2:, : N // 2] = -100.0

    got, _ = attn_mod.apply(variables, x, jnp.asarray(mask))

    p = variables["params"]
    xt = torch.from_numpy(np.asarray(x))
    want = _torch_v1_attention(
        xt,
        torch.from_numpy(np.asarray(p["qkv"]["kernel"]).T),
        torch.from_numpy(np.asarray(p["qkv"]["bias"])),
        torch.from_numpy(np.asarray(p["proj"]["kernel"]).T),
        torch.from_numpy(np.asarray(p["proj"]["bias"])),
        torch.from_numpy(np.asarray(p["relative_position_bias_table"])),
        window, nh, torch.from_numpy(mask))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_ann_v2_attention_runs_and_is_finite():
    window = (2, 3, 3)
    N, C, nh, B_ = 18, 8, 2, 2
    attn_mod = WindowAttention3D(dim=C, window_size=window, num_heads=nh,
                                 version="swinv2", qkv_bias=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B_, N, C))
    variables = attn_mod.init(jax.random.PRNGKey(1), x)
    out, attn = attn_mod.apply(variables, x, None)
    assert out.shape == (B_, N, C)
    assert np.isfinite(np.asarray(out)).all()
    # softmax rows sum to 1 pre-bias? (v2 adds bias AFTER softmax of the
    # hamming scores, per the reference — just check finiteness of attn)
    assert np.isfinite(np.asarray(attn)).all()
