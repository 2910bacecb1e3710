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


def test_bf16_end_task_drift_bounded():
    """End-task drift guard (VERDICT r4 #4): the bf16 inference path's AEE
    on a trained-for-a-few-steps structured task must stay within a bounded
    relative distance of the f32 path's AEE on the same params. Spiking
    nets are bitwise-chaotic under precision changes (PERF_NOTES round 3),
    so the guard is on the END METRIC, not activations; the full-scale
    on-chip numbers live in PERF_NOTES round 5."""
    from sdformerflow_tpu.data.dsec import SyntheticEventFlowDataset
    from sdformerflow_tpu.losses import aee_metrics
    from sdformerflow_tpu.training.train_step import make_eval_step

    swin = SwinConfig(
        arc_type="swinv1",
        patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
        input_size=(32, 32), patch_size=(1, 1, 2, 2), depths=(1, 1),
        num_heads=(2, 2), out_indices=(0, 1), window_size=(2, 3, 3),
        qk_scale=0.125, drop_path_rate=0.0)
    cfg = SpikingConfig(num_steps=10, v_th=0.1, v_reset=None,
                        neuron_type="psn", spike_norm="BN")
    model = SpikingformerFlowNet(swin=swin, cfg=cfg, num_bins=10,
                                 base_num_channels=16, num_encoders=2,
                                 use_upsample_conv=False, ms=True)
    ds = SyntheticEventFlowDataset(num_samples=16, num_bins=10, height=32,
                                   width=32, structured=True, seed=5)
    tx = build_optimizer(lr=1e-3, steps_per_epoch=16)
    sample = encode_input(jnp.asarray(np.stack([ds[0][0]])))
    state = create_train_state(model, tx, sample, jax.random.PRNGKey(0))
    step = make_train_step(donate=False)
    for i in range(16):
        chunk, mask, label = ds[i]
        batch = {"chunk": jnp.asarray(chunk[None], jnp.float32),
                 "label": jnp.asarray(label[None], jnp.float32),
                 "mask": jnp.asarray(mask[None, None], jnp.float32)}
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))

    ev32 = make_eval_step()
    ev16 = make_eval_step(compute_dtype=jnp.bfloat16)
    aee32, aee16, n = 0.0, 0.0, 8
    for i in range(16, 16 + n):
        chunk, mask, label = ds[i % len(ds)]
        c = jnp.asarray(chunk[None], jnp.float32)
        lbl = jnp.asarray(label[None], jnp.float32)
        mk = jnp.asarray(mask[None, None], jnp.float32)
        f32 = ev32(state, c)[-1]
        f16 = ev16(state, c)[-1]
        aee32 += float(aee_metrics(f32, lbl, mk)["AEE"][0])
        aee16 += float(aee_metrics(f16, lbl, mk)["AEE"][0])
    aee32 /= n
    aee16 /= n
    drift = abs(aee16 - aee32) / max(aee32, 1e-6)
    # bound: bf16 spike flips must not change the end metric materially
    assert drift < 0.15, (aee32, aee16, drift)
