"""End-to-end tiny train-step tests: model init, one optimizer step, loss
decreases over a few steps, and data-parallel sharding over the virtual
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.models.common import SpikingConfig, SwinConfig
from sdformerflow_tpu.models.snn_flownet import SpikingformerFlowNet
from sdformerflow_tpu.parallel import make_mesh, replicate, shard_batch
from sdformerflow_tpu.training.optim import build_optimizer
from sdformerflow_tpu.training.train_step import (create_train_state,
                                                  make_eval_step,
                                                  make_train_step)


def _tiny_model():
    sw = SwinConfig(arc_type="swinv1",
                    patch_embed_type="MS_PED_Spiking_PatchEmbed_Conv_sfn",
                    input_size=(16, 16), patch_size=(1, 1, 2, 2),
                    depths=(1, 1), num_heads=(2, 2), out_indices=(0, 1),
                    window_size=(2, 2, 2), qk_scale=0.125,
                    drop_path_rate=0.1)
    cfg = SpikingConfig(num_steps=4, v_th=0.1, v_reset=None,
                        neuron_type="psn", spike_norm="BN")
    return SpikingformerFlowNet(swin=sw, cfg=cfg, num_bins=4,
                                base_num_channels=16, num_encoders=2,
                                use_upsample_conv=False, ms=True)


def _batch(b=2, bins=4, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    chunk = rng.normal(0, 1, (b, bins, h, w)).astype(np.float32)
    label = rng.normal(0, 1, (b, 2, h, w)).astype(np.float32)
    mask = np.ones((b, 1, h, w), np.float32)
    return {"chunk": jnp.asarray(chunk), "label": jnp.asarray(label),
            "mask": jnp.asarray(mask)}


@pytest.fixture(scope="module")
def state_and_steps():
    model = _tiny_model()
    tx = build_optimizer(lr=1e-3, steps_per_epoch=10, clip_grad=100.0)
    batch = _batch()
    from sdformerflow_tpu.ops.normalization import encode_input
    sample = encode_input(batch["chunk"])
    state = create_train_state(model, tx, sample, jax.random.PRNGKey(0))
    train_step = make_train_step(donate=False)
    eval_step = make_eval_step()
    return state, train_step, eval_step


@pytest.mark.smoke
def test_single_train_step(state_and_steps):
    state, train_step, _ = state_and_steps
    batch = _batch()
    new_state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(new_state.step) == 1
    # parameters actually changed
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(delta)) > 0


@pytest.mark.smoke
def test_loss_decreases(state_and_steps):
    state, train_step, _ = state_and_steps
    batch = _batch()
    losses = []
    for i in range(8):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.smoke
def test_eval_step(state_and_steps):
    state, _, eval_step = state_and_steps
    batch = _batch()
    flows = eval_step(state, batch["chunk"])
    assert flows[-1].shape == (2, 2, 16, 16)
    assert np.isfinite(np.asarray(flows[-1])).all()


def test_data_parallel_mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    model = _tiny_model()
    tx = build_optimizer(lr=1e-3, steps_per_epoch=10)
    batch = _batch(b=8)
    from sdformerflow_tpu.ops.normalization import encode_input
    sample = encode_input(batch["chunk"])
    state = create_train_state(model, tx, sample, jax.random.PRNGKey(0))

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    # batch is actually split across devices
    assert len(sharded["chunk"].sharding.device_set) == 8

    train_step = make_train_step(donate=False)
    new_state, metrics = train_step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated after the step
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_eval_step_from_raw_events(state_and_steps):
    """Eval path symmetric with training: raw padded event buffers are
    voxelized on-device inside the jitted eval step."""
    from sdformerflow_tpu.training.train_step import make_eval_step
    state, _, _ = state_and_steps
    rng = np.random.default_rng(5)
    B, N, H, W = 2, 1 << 10, 16, 16
    events = {
        "x": jnp.asarray(rng.uniform(0, W - 1, (B, N)), jnp.float32),
        "y": jnp.asarray(rng.uniform(0, H - 1, (B, N)), jnp.float32),
        "t": jnp.asarray(np.sort(rng.uniform(0, 1, (B, N)), axis=1),
                         jnp.float32),
        "p": jnp.asarray(rng.integers(0, 2, (B, N)), jnp.float32),
        "valid": jnp.asarray(rng.uniform(size=(B, N)) < 0.9),
    }
    eval_step = make_eval_step(voxelize=dict(num_bins=4, height=H, width=W))
    flows = eval_step(state, events)
    assert flows[-1].shape == (B, 2, H, W)
    assert np.isfinite(np.asarray(flows[-1])).all()


def test_remat_policies_match_unremat():
    """jax.checkpoint over the loss is a memory lever, not a semantic one.
    SGD(1) trick (as in test_multichip_equivalence): params_delta == -grads,
    so comparing post-step params compares the gradients themselves —
    AdamW's sqrt(nu) normalization would amplify near-zero-grad recompute
    noise into O(lr) sign flips and hide the real comparison."""
    import optax
    model = _tiny_model()
    tx = optax.sgd(1.0)
    batch = _batch()
    from sdformerflow_tpu.ops.normalization import encode_input
    sample = encode_input(batch["chunk"])
    state = create_train_state(model, tx, sample, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)
    base_state, base_m = make_train_step(donate=False)(state, batch, rng)
    remat_state, remat_m = make_train_step(donate=False, remat="dots")(
        state, batch, rng)
    assert np.allclose(float(base_m["loss"]), float(remat_m["loss"]),
                       rtol=1e-6)
    assert np.allclose(float(base_m["grad_norm"]),
                       float(remat_m["grad_norm"]), rtol=1e-5)
    # params_delta == -grads; f32 recompute reassociates reductions, so
    # allow tiny absolute noise relative to the grad scale
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        base_state.params, remat_state.params)
