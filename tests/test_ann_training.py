"""ANN STTFlowNet training-step regression: gradients stay finite through
the swin-v2 cosine attention (its normalization once produced NaN grads at
zero vectors) and the loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.ann_flownet import STTFlowNet
from sdformerflow_tpu.training.optim import build_optimizer
from sdformerflow_tpu.training.train_step import (create_train_state,
                                                  make_train_step)


def test_ann_swinv2_train_steps_stay_finite():
    swin = SwinConfig(arc_type="swinv2", patch_embed_type="PatchEmbedLocal",
                      input_size=(16, 16), patch_size=(2, 2, 2),
                      depths=(1, 1), num_heads=(2, 2), out_indices=(0, 1),
                      window_size=(2, 2, 2), qk_scale=None,
                      drop_path_rate=0.2)
    model = STTFlowNet(swin=swin, num_bins=4, base_num_channels=16,
                       num_encoders=2, use_upsample_conv=True,
                       norm_input=True)
    rng = np.random.default_rng(0)
    chunk = rng.normal(0, 1, (2, 4, 16, 16)).astype(np.float32)
    chunk *= rng.uniform(size=chunk.shape) < 0.1  # sparse voxels (zeros!)
    batch = {
        "chunk": jnp.asarray(chunk),
        "label": jnp.asarray(rng.normal(0, 1, (2, 2, 16, 16)), jnp.float32),
        "mask": jnp.ones((2, 1, 16, 16), jnp.float32),
    }
    tx = build_optimizer(lr=1e-3, steps_per_epoch=10)
    state = create_train_state(model, tx, batch["chunk"],
                               jax.random.PRNGKey(0))
    step = make_train_step(donate=False, polarity=False, norm_input=None)
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        loss = float(metrics["loss"])
        assert np.isfinite(loss), f"NaN/inf at step {i}"
        losses.append(loss)
    assert losses[-1] < losses[0], losses
