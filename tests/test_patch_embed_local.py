"""Spiking_PatchEmbedLocal architecture parity (VERDICT r1 missing #7).

Reference: /root/reference/models/STSwinNet_SNN/Spiking_modules.py:975-1063
— distinct from the sfn embed: full-width head at stride 1, FOUR residual
blocks, projection at the full spatial patch stride, no intermediate /2
conv; head input width in_chans*2 // (num_steps - 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models.common import SpikingConfig
from sdformerflow_tpu.models.snn_flownet import PATCH_EMBEDS
from sdformerflow_tpu.models.spiking_patch_embed import SpikingPatchEmbedLocal

CFG = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None, neuron_type="psn",
                    spike_norm="BN")


@pytest.mark.parametrize("use_ms", [False, True])
def test_local_embed_shapes_and_structure(use_ms):
    m = SpikingPatchEmbedLocal(img_size=(16, 16), patch_size=(1, 1, 2, 2),
                               in_chans=4, embed_dim=32, cfg=CFG,
                               use_ms=use_ms)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 2, 16, 16))
    variables = m.init({"params": jax.random.PRNGKey(1)}, x, False)
    out = m.apply(variables, x, False)
    # stride = patch only (no extra /2): 16/2 = 8
    assert out.shape == (4, 2, 8, 8, 32)
    assert m.patches_resolution == (8, 8)
    params = variables["params"]
    # 4 residual blocks (reference num_resblocks=4, :1014)
    res = params["residual_encoding"]
    assert {f"res{i}" for i in range(4)} <= set(res.keys())
    # head consumes in_chans*2 // (T-1) = 8 // 3 = 2 channels
    head_kernel = jax.tree_util.tree_leaves(
        {k: v for k, v in params["head"].items() if "conv" in k})[0]
    assert head_kernel.shape[-2] == 2
    assert np.isfinite(np.asarray(out)).all()


def test_local_embed_plain_conv_proj():
    m = SpikingPatchEmbedLocal(img_size=(16, 16), patch_size=(1, 1, 2, 2),
                               in_chans=4, embed_dim=32, cfg=CFG,
                               spiking_proj=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 16, 16))
    variables = m.init({"params": jax.random.PRNGKey(1)}, x, False)
    out = m.apply(variables, x, False)
    assert out.shape == (4, 1, 8, 8, 32)
    # plain conv proj: raw conv params, not a spiking layer subtree
    assert set(variables["params"]["proj"].keys()) == {"kernel", "bias"}


def test_registry_local_entries_are_distinct_class():
    m = PATCH_EMBEDS["Spiking_PatchEmbedLocal"](
        img_size=(16, 16), patch_size=(1, 1, 2, 2), in_chans=4,
        embed_dim=32, cfg=CFG)
    assert isinstance(m, SpikingPatchEmbedLocal) and not m.use_ms
    m2 = PATCH_EMBEDS["MS_Spiking_PatchEmbedLocal"](
        img_size=(16, 16), patch_size=(1, 1, 2, 2), in_chans=4,
        embed_dim=32, cfg=CFG)
    assert isinstance(m2, SpikingPatchEmbedLocal) and m2.use_ms


def test_backbone_runs_with_local_embed():
    from sdformerflow_tpu.models.common import SwinConfig
    from sdformerflow_tpu.models.snn_flownet import SpikingSwinTransformer3D
    swin = SwinConfig(
        arc_type="swinv1", patch_embed_type="Spiking_PatchEmbedLocal",
        input_size=(16, 16), patch_size=(1, 1, 2, 2), depths=(1, 1),
        num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 2, 2),
        qk_scale=0.125, drop_path_rate=0.0)
    model = SpikingSwinTransformer3D(swin=swin, cfg=CFG, in_chans=4,
                                     embed_dim=16)
    chunk = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(1)}, chunk, False)
    outs = model.apply(variables, chunk, False)
    assert len(outs) == 2
    # stage 0 at patches_resolution (8, 8), stage 1 downsampled
    assert outs[0].shape == (4, 1, 8, 8, 16)
    assert outs[1].shape == (4, 1, 4, 4, 32)
