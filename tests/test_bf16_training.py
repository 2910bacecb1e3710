"""bf16 mixed-precision training: f32 master params, bf16 compute — the TPU
equivalent of the reference's AMP path (optimizer.use_amp)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.training.optim import build_optimizer
from sdformerflow_tpu.training.train_step import (create_train_state,
                                                  make_train_step)


def test_bf16_train_step_keeps_f32_params_and_learns():
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
    batch = {
        "chunk": jnp.asarray(rng.normal(0, 1, (2, 4, 16, 16)), jnp.float32),
        "label": jnp.asarray(rng.normal(0, 1, (2, 2, 16, 16)), jnp.float32),
        "mask": jnp.ones((2, 1, 16, 16), jnp.float32),
    }
    tx = build_optimizer(lr=1e-3, steps_per_epoch=10)
    state = create_train_state(model, tx, encode_input(batch["chunk"]),
                               jax.random.PRNGKey(0))
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # master params stay f32
    dtypes = {a.dtype for a in jax.tree_util.tree_leaves(state.params)}
    assert dtypes == {jnp.dtype(jnp.float32)}, dtypes
