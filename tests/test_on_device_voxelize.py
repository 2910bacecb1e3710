"""End-to-end on-device voxelization inside the jitted train step: raw
padded event buffers -> voxel grids -> encode -> model -> loss, one XLA
program (the BASELINE.json north-star path)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.ops.normalization import encode_input
from sdformerflow_tpu.ops.voxel import pad_events, voxel_grid_signed
from sdformerflow_tpu.training.optim import build_optimizer
from sdformerflow_tpu.training.train_step import (create_train_state,
                                                  make_train_step,
                                                  voxelize_batch)


def _event_batch(b=2, n_max=256, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    xs, ys, ts, ps, valids = [], [], [], [], []
    for i in range(b):
        n = int(rng.integers(50, n_max))
        x = rng.uniform(0, w - 1, n).astype(np.float32)
        y = rng.uniform(0, h - 1, n).astype(np.float32)
        t = np.sort(rng.uniform(0, 1.0, n)).astype(np.float32)
        p = rng.integers(0, 2, n).astype(np.float32)
        xp, yp, tp, pp, valid = pad_events(x, y, t, p, n_max)
        xs.append(xp); ys.append(yp); ts.append(tp); ps.append(pp)
        valids.append(valid)
    return {k: jnp.asarray(np.stack(v)) for k, v in
            (("x", xs), ("y", ys), ("t", ts), ("p", ps), ("valid", valids))}


def test_voxelize_batch_matches_single():
    events = _event_batch()
    grids = voxelize_batch(events, num_bins=4, height=16, width=16)
    assert grids.shape == (2, 4, 16, 16)
    # per-sample equivalence with the single-sample rasterizer
    for i in range(2):
        valid = np.asarray(events["valid"][i])
        t = np.asarray(events["t"][i])
        t_valid = t[valid]
        single = voxel_grid_signed(
            events["x"][i], events["y"][i], events["t"][i], events["p"][i],
            num_bins=4, height=16, width=16, valid=events["valid"][i],
            t_range=(t_valid[0], t_valid[-1]))
        np.testing.assert_allclose(np.asarray(grids[i]), np.asarray(single),
                                   atol=1e-5)


def test_train_step_from_raw_events():
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
    events = _event_batch()
    rng = np.random.default_rng(1)
    batch = {
        "events": events,
        "label": jnp.asarray(rng.normal(0, 1, (2, 2, 16, 16)), jnp.float32),
        "mask": jnp.ones((2, 1, 16, 16), jnp.float32),
    }
    sample = encode_input(voxelize_batch(events, num_bins=4, height=16,
                                         width=16))
    tx = build_optimizer(lr=1e-3, steps_per_epoch=10)
    state = create_train_state(model, tx, sample, jax.random.PRNGKey(0))
    train_step = make_train_step(
        donate=False, voxelize=dict(num_bins=4, height=16, width=16))
    new_state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
