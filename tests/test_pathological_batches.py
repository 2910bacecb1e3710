"""Pathological-batch robustness: an all-zero event chunk (empty crop) makes
every BatchNorm amplify gradients by ~1/sqrt(eps); the optimizer must skip
non-finite updates and keep training afterwards."""

import jax
import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.training.optim import build_optimizer
from sdformerflow_tpu.training.train_step import (create_train_state,
                                                  make_train_step)


def test_empty_chunk_does_not_poison_params():
    swin = SwinConfig(
        arc_type="swinv1",
        patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
        input_size=(16, 16), patch_size=(1, 1, 2, 2), depths=(1, 1),
        num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 2, 2),
        qk_scale=0.125, drop_path_rate=0.0)
    cfg = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type="psn", spike_norm="BN")
    model = SpikingformerFlowNet(swin=swin, cfg=cfg, num_bins=4,
                                 base_num_channels=16, num_encoders=2,
                                 use_upsample_conv=False, ms=True)
    rng = np.random.default_rng(0)
    normal = {
        "chunk": jnp.asarray(rng.normal(0, 1, (1, 4, 16, 16)), jnp.float32),
        "label": jnp.asarray(rng.normal(0, 1, (1, 2, 16, 16)), jnp.float32),
        "mask": jnp.ones((1, 1, 16, 16), jnp.float32),
    }
    empty = dict(normal, chunk=jnp.zeros((1, 4, 16, 16)))

    tx = build_optimizer(lr=1e-3, steps_per_epoch=10, clip_grad=100.0)
    state = create_train_state(model, tx, encode_input(normal["chunk"]),
                               jax.random.PRNGKey(0))
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)

    state, m = step(state, normal, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    # the pathological batch: update must be skipped, params stay finite
    state, m = step(state, empty, jax.random.PRNGKey(2))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert bool(jnp.isfinite(leaf).all())

    # training continues normally afterwards
    state, m = step(state, normal, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert bool(jnp.isfinite(leaf).all())
