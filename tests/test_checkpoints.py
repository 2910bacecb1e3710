"""Orbax checkpoint save/restore/resume round trip on a real TrainState."""

import jax
import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.training.checkpoints import (latest_epoch,
                                                   restore_checkpoint,
                                                   save_checkpoint)
from sdformerflow_tpu.training.optim import build_optimizer
from sdformerflow_tpu.training.train_step import (create_train_state,
                                                  make_train_step)


def _setup():
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
    return state, batch


def test_checkpoint_round_trip(tmp_path):
    state, batch = _setup()
    step = make_train_step(donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    state, _ = step(state, batch, jax.random.PRNGKey(2))

    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=3, metrics={"train_loss": 1.0})
    assert latest_epoch(ckpt) == 3

    fresh, _ = _setup()
    restored, epoch = restore_checkpoint(ckpt, fresh)
    assert epoch == 3
    assert int(restored.step) == int(state.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues from the restored state identically — the
    # post-step PARAMS comparison is what exercises the restored
    # opt_state (Adam moments + schedule counts); the loss alone is
    # computed pre-update and would pass with a reset optimizer
    s1, m1 = step(restored, batch, jax.random.PRNGKey(3))
    s2, m2 = step(state, batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s1.opt_state),
                    jax.tree_util.tree_leaves(s2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
