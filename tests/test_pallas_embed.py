"""Channels-second Pallas embed kernels (ops/pallas_embed.py) vs the flax
module path — interpret mode on CPU; the on-chip A/B lives in
scripts/bench_breakdown.py / bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models.common import SpikingConfig
from sdformerflow_tpu.models.spiking_patch_embed import \
    MSPEDSpikingPatchEmbedConvSfn
from sdformerflow_tpu.ops import pallas_embed


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl
    real_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return real_call(*args, **kwargs)

    monkeypatch.setattr(pallas_embed.pl, "pallas_call", interp_call)
    yield


def _perturb(variables, seed):
    rng = np.random.default_rng(seed)

    def walk(tree, stats):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, stats)
            else:
                arr = np.asarray(v)
                if stats and k == "var":
                    out[k] = jnp.asarray(rng.uniform(0.3, 2.0, arr.shape),
                                         arr.dtype)
                elif stats and k == "mean":
                    out[k] = jnp.asarray(rng.normal(0, 0.3, arr.shape),
                                         arr.dtype)
                else:
                    out[k] = v
        return out

    return {"params": variables["params"],
            "batch_stats": walk(variables["batch_stats"], True)}


def test_psn_spike_cs_matches_einsum():
    rng = np.random.default_rng(0)
    T, C, H, W = 4, 16, 12, 256
    x = jnp.asarray(rng.normal(size=(T, C, H, W)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(T, T)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(T, 1)).astype(np.float32))
    want = (jnp.einsum("ts,schw->tchw", w, x)
            + b.reshape(T, 1, 1, 1) >= 0).astype(jnp.float32)
    got = pallas_embed.psn_spike_cs(x, w, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("ksize,cin,cout,wd", [(3, 8, 16, 256), (3, 8, 16, 200),
                                               (1, 8, 16, 128)])
def test_conv3x3_affine_cs_matches_xla(ksize, cin, cout, wd):
    rng = np.random.default_rng(1)
    T, H = 3, 16
    x = jnp.asarray(rng.normal(size=(T, cin, H, wd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(ksize, ksize, cin, cout)).astype(
        np.float32) * 0.1)
    a = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    b = jnp.asarray(rng.normal(size=cout).astype(np.float32))
    pad = ksize // 2
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    want = want * a[None, :, None, None] + b[None, :, None, None]
    got = pallas_embed.conv3x3_affine_cs(x, k, a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_embed_forward_matches_module():
    H, W = 32, 32
    T = 4
    cfg = SpikingConfig(num_steps=T, v_th=0.1, v_reset=None,
                        neuron_type="psn", spike_norm="BN")
    embed = MSPEDSpikingPatchEmbedConvSfn(img_size=(H, W), in_chans=T,
                                          embed_dim=16, cfg=cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, T, 2, H, W), jnp.float32)
    variables = embed.init({"params": jax.random.PRNGKey(1)}, x, False)
    variables = _perturb(variables, 2)
    want = embed.apply(variables, x, False)
    got = pallas_embed.fused_embed_forward(
        variables["params"], variables["batch_stats"], x, num_steps=T)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-3)
    assert float(jnp.abs(want).sum()) > 0
