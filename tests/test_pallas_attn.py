"""Fused spiking-QK window attention: algebra + kernel parity.

Layers of evidence (ops/pallas_attn.py header):
1. ``qk_attention_pairlocal`` (the pair-local re-derivation of the
   reference's raw-refold algebra) must match the reference-parity flax
   module ``SpikingQKWindowAttention3D`` bit-for-bit in f64 — this validates
   the fold cancellation/regroup derivation itself.
2. The Pallas kernel (interpret mode on CPU) must match the pair-local
   oracle.

Per PERF_NOTES round-3 ("trap for future testers"): every parameter —
positional encoding, PSN time-mix weights, BN stats — is RANDOMIZED before
the A/B, because zero-init PEs and symmetric PSN inits are
permutation-degenerate and would hide rerouting bugs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models.common import SpikingConfig
from sdformerflow_tpu.models.spiking_swin import SpikingQKWindowAttention3D
from sdformerflow_tpu.ops.pallas_attn import (QKAttnParams, bn_eval_affine,
                                              fused_qk_attention,
                                              qk_attention_pairlocal)

pytestmark = pytest.mark.smoke


def _randomize(tree, key, scale=0.5):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    new = [jnp.asarray(scale * jax.random.normal(k, l.shape), l.dtype)
           for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)


def _make_case(key, M=12, wh=3, ww=3, C=32, nh=4, dtype=jnp.float32):
    cfg = SpikingConfig(num_steps=2, v_th=0.1, v_reset=None,
                        neuron_type="psn", spike_norm="BN")
    mod = SpikingQKWindowAttention3D(
        dim=C, window_size=(2, wh, ww), num_heads=nh, cfg=cfg, norm="BN")
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (2, M, wh, ww, C), dtype)
    variables = mod.init({"params": k2}, x, None, False)
    params = _randomize(variables["params"], k3)
    # random positive variances; random means
    stats = _randomize(variables.get("batch_stats", {}), k4)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.abs(a) + 0.3 if a.shape else a, stats)
    return mod, {"params": params, "batch_stats": stats}, x, nh


def _to_kernel_params(variables, nh):
    p = variables["params"]
    s = variables["batch_stats"]

    def aff(scope):
        bn = p[scope]["bn"]["BatchNorm_0"]
        st = s[scope]["bn"]["BatchNorm_0"]
        return bn_eval_affine(bn["scale"], bn["bias"], st["mean"], st["var"])

    aq, cq = aff("q")
    ak, ck = aff("k")
    pbn = p["proj_bn"]["BatchNorm_0"]
    pst = s["proj_bn"]["BatchNorm_0"]
    ap, cp = bn_eval_affine(pbn["scale"], pbn["bias"], pst["mean"],
                            pst["var"])
    pe = p["k"]["positional_encoding"]
    C = p["q"]["linear"]["kernel"].shape[0]
    return QKAttnParams(
        w_in=p["proj_sn"]["weight"], b_in=p["proj_sn"]["bias"],
        wq=p["q"]["linear"]["kernel"], aq=aq, cq=cq,
        w_q=p["q"]["sn"]["weight"], b_q=p["q"]["sn"]["bias"],
        wk=p["k"]["linear"]["kernel"], ak=ak, ck=ck,
        pe=pe.reshape(2, -1, C),
        w_k=p["k"]["sn"]["weight"], b_k=p["k"]["sn"]["bias"],
        w_t=p["sn2_q"]["weight"], b_t=p["sn2_q"]["bias"],
        wp=p["proj"]["kernel"], bp=p["proj"]["bias"], ap=ap, cp=cp)


def test_pairlocal_matches_flax_module_f64():
    with jax.enable_x64(True):
        mod, variables, x, nh = _make_case(jax.random.PRNGKey(0),
                                           dtype=jnp.float64)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), variables)
        ref, _ = mod.apply(variables, x, None, False)
        got = qk_attention_pairlocal(x, _to_kernel_params(variables, nh), nh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-12)


def test_pairlocal_matches_flax_module_f64_multiwindow():
    # different geometry: more heads, wider windows, M not a multiple of 4
    with jax.enable_x64(True):
        mod, variables, x, nh = _make_case(jax.random.PRNGKey(7), M=10,
                                           wh=2, ww=5, C=48, nh=6,
                                           dtype=jnp.float64)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), variables)
        ref, _ = mod.apply(variables, x, None, False)
        got = qk_attention_pairlocal(x, _to_kernel_params(variables, nh), nh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-12)


def test_kernel_matches_pairlocal_interpret():
    mod, variables, x, nh = _make_case(jax.random.PRNGKey(1))
    p = _to_kernel_params(variables, nh)
    ref = qk_attention_pairlocal(x, p, nh)
    got = fused_qk_attention(x, p, nh, interpret=True)
    # f32 vs f32 with different accumulation order: rounding-level only.
    # Spike flips would show as O(1) diffs (the signal is 0/1-masked), so a
    # tight absolute tolerance is the discreteness check.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_kernel_block_sizes_agree():
    mod, variables, x, nh = _make_case(jax.random.PRNGKey(2), M=24)
    p = _to_kernel_params(variables, nh)
    a = fused_qk_attention(x, p, nh, block_cols=2, interpret=True)
    b = fused_qk_attention(x, p, nh, block_cols=12, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_kernel_rejects_odd_m_and_wd1():
    mod, variables, x, nh = _make_case(jax.random.PRNGKey(3))
    p = _to_kernel_params(variables, nh)
    with pytest.raises(ValueError):
        fused_qk_attention(x[:, :11], p, nh, interpret=True)
    with pytest.raises(ValueError):
        fused_qk_attention(x[:1], p, nh, interpret=True)


def test_kernel_token_padding_matches_pairlocal():
    """en4-stage3-shaped case (M=30, 9x9 windows -> odd ns=81): no
    Mosaic-legal block exists at the native token count, so the kernel pads
    token rows (ns 81 -> 84, jb=2; ops/pallas_attn._pick_block_padded) —
    every kernel stage is row-local, so the padding must be exactly
    invisible in the output."""
    from sdformerflow_tpu.ops.pallas_attn import (_pick_block,
                                                  _pick_block_padded)
    assert _pick_block(30, 81, 768) is None
    # at stage3's real C=768 the VMEM budget bounds the block to 2 columns
    assert _pick_block_padded(30, 81, 768) == (2, 84)
    # the tinier test case below still pads to 84 (block choice is free)
    assert _pick_block(30, 81, 64) is None
    assert _pick_block_padded(30, 81, 64)[1] == 84
    mod, variables, x, nh = _make_case(jax.random.PRNGKey(11), M=30,
                                       wh=9, ww=9, C=64, nh=4)
    p = _to_kernel_params(variables, nh)
    ref = qk_attention_pairlocal(x, p, nh)
    got = fused_qk_attention(x, p, nh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_kernel_token_padding_bitwise_invisible():
    """Padding must not perturb real rows AT ALL: every kernel stage is
    row-local, so the padded run must be BIT-identical to the same kernel
    forced to run unpadded (interpret mode ignores the sublane-legality
    rule that padding exists to satisfy on real Mosaic)."""
    mod, variables, x, nh = _make_case(jax.random.PRNGKey(12), M=30,
                                       wh=9, ww=9, C=64, nh=4)
    p = _to_kernel_params(variables, nh)
    padded = fused_qk_attention(x, p, nh, interpret=True)
    unpadded = fused_qk_attention(x, p, nh, block_cols=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(padded), np.asarray(unpadded))
