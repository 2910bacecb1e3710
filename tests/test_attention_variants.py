"""Coverage of the less-travelled spiking attention/norm variants: the SEW
BN-attention in swinv1 and swinv2(Hamming) modes, the SDSA configuration
(spiked input, no output spike), and GN/LN norm paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.models.spiking_swin import SpikingBNWindowAttention3D
from sdformerflow_tpu.ops.normalization import encode_input

CFG = SpikingConfig(num_steps=2, v_th=0.5, v_reset=None, neuron_type="lif",
                    spike_norm="BN")


@pytest.mark.parametrize("version", ["swinv1", "swinv2"])
def test_sew_bn_attention_versions(version):
    T, B_, H, W, C = 2, 3, 3, 3, 8
    attn = SpikingBNWindowAttention3D(dim=C, window_size=(T, H, W),
                                      num_heads=2, cfg=CFG, version=version,
                                      qk_scale=0.125, norm="BN")
    x = jax.random.uniform(jax.random.PRNGKey(0), (T, B_, H, W, C))
    variables = attn.init(jax.random.PRNGKey(1), x)
    out, score = attn.apply(variables, x)
    # time-major windows out (the block's window_reverse_tm consumes these)
    assert out.shape == (T, B_, H, W, C)
    assert np.isfinite(np.asarray(out)).all()
    if version == "swinv2":
        # Hamming attention goes through a softmax -> rows of the pre-bias
        # score can't be checked directly, but scores must be finite
        assert np.isfinite(np.asarray(score)).all()


def test_sew_attention_with_shift_mask():
    from sdformerflow_tpu.ops.windows import compute_mask
    T, H, W, C = 2, 4, 4, 8
    ws, ss = (2, 2, 2), (1, 1, 1)
    mask = compute_mask(2, 4, 4, ws, ss)  # nW=4 windows
    attn = SpikingBNWindowAttention3D(dim=C, window_size=ws, num_heads=2,
                                      cfg=CFG, version="swinv1",
                                      qk_scale=0.125, norm="BN")
    nW = mask.shape[0]
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, nW, 2, 2, C))
    variables = attn.init(jax.random.PRNGKey(1), x, mask)
    out, _ = attn.apply(variables, x, mask)
    assert np.isfinite(np.asarray(out)).all()


def test_sdsa_configuration():
    """SDSA = spiked input, BN'd (unspiked) output."""
    T, B_, H, W, C = 2, 2, 3, 3, 8
    attn = SpikingBNWindowAttention3D(dim=C, window_size=(T, H, W),
                                      num_heads=2, cfg=CFG,
                                      version="swinv1", qk_scale=0.125,
                                      norm="BN", spike_input=True,
                                      spike_output=False)
    x = jax.random.uniform(jax.random.PRNGKey(0), (T, B_, H, W, C))
    variables = attn.init(jax.random.PRNGKey(1), x)
    out, _ = attn.apply(variables, x)
    assert np.isfinite(np.asarray(out)).all()
    # no output spike -> values are not restricted to {0, 1}
    vals = np.unique(np.asarray(out))
    assert not set(vals.tolist()) <= {0.0, 1.0}


@pytest.mark.parametrize("spike_norm", ["GN", "LN", "TDBN", "BNTT",
                                        "BN_notrack"])
def test_sew_flownet_norm_zoo(spike_norm):
    swin = SwinConfig(arc_type="swinv1",
                      patch_embed_type="Spiking_PatchEmbed_Conv_sfn",
                      input_size=(16, 16), patch_size=(1, 1, 2, 2),
                      depths=(1, 1), num_heads=(2, 2), out_indices=(0, 1),
                      window_size=(2, 2, 2), qk_scale=0.125,
                      drop_path_rate=0.0)
    cfg = SpikingConfig(num_steps=4, v_th=0.5, v_reset=None,
                        neuron_type="lif", spike_norm=spike_norm)
    model = SpikingformerFlowNet(swin=swin, cfg=cfg, num_bins=4,
                                 base_num_channels=16, num_encoders=2,
                                 use_upsample_conv=True, ms=False)
    x = encode_input(jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16)))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, False)
    out = model.apply(variables, x, False)
    assert np.isfinite(np.asarray(out["flow"][-1])).all()
