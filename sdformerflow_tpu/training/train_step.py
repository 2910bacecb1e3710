"""Jitted train/eval steps with data-parallel sharding.

Replaces the reference's train-loop inner body
(/root/reference/train_flow_parallel_supervised_SNN.py:229-353):
- input encoding (polarity split / nonzero norm / binarize) runs on-device
  inside the same jitted program as the forward/backward pass;
- SpikingJelly ``reset_net`` is unnecessary (neuron state is functional);
- AMP GradScaler is unnecessary (bf16 on TPU needs no loss scaling);
- gradient clipping (global norm 100) and AdamW + MultiStepLR(gamma=0.5) are
  in the optax chain (see optim.py);
- gradient accumulation maps to optax.MultiSteps.

BatchNorm running statistics live in a ``batch_stats`` collection threaded
through the TrainState (the reference mutates module buffers in place).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..losses import flow_loss_supervised
from ..ops.normalization import encode_input


@struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx):
        return cls(step=0, params=params, batch_stats=batch_stats,
                   opt_state=tx.init(params), apply_fn=apply_fn, tx=tx)


def create_train_state(model, tx, sample_chunk, rng, train: bool = True):
    """Initialize model variables + optimizer state."""
    init_rngs = {"params": rng, "droppath": jax.random.fold_in(rng, 1)}
    variables = model.init(init_rngs, sample_chunk, False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        tx=tx)


def make_train_step(*, encoding="voxel", polarity=True, norm_input="minmax",
                    spike_th=None, flow_scaling=1.0, gamma=None,
                    mask_events=False, donate=True):
    """Build the jitted train step. ``batch`` is a dict with
    chunk [B, bins, H, W] (signed voxels) or [B, bins, 2, H, W],
    label [B, 2, H, W], mask [B, 1, H, W]."""

    def loss_fn(params, state, chunk, label, mask, rng):
        out, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            chunk, True, mutable=["batch_stats"], rngs={"droppath": rng})
        loss = flow_loss_supervised(out["flow"], label, mask,
                                    flow_scaling=flow_scaling, gamma=gamma)
        return loss, mutated["batch_stats"]

    def train_step(state: TrainState, batch, rng):
        chunk = batch["chunk"]
        if chunk.ndim == 4 or encoding == "voxel":
            x = encode_input(chunk, encoding=encoding, polarity=polarity,
                             norm_input=norm_input, spike_th=spike_th)
        else:
            x = chunk
        mask = batch["mask"]
        if mask_events:
            axes = (1, 2) if x.ndim == 5 else (1,)
            event_mask = (x.sum(axis=axes) != 0)  # [B, H, W]
            mask = mask * event_mask[:, None].astype(mask.dtype)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, x, batch["label"], mask, rng)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return dataclasses.replace(state, step=state.step + 1,
                                   params=new_params, batch_stats=new_bs,
                                   opt_state=new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(*, encoding="voxel", polarity=True, norm_input="minmax",
                   spike_th=None, use_batch_stats=False):
    """Build the jitted eval step returning the finest flow prediction.

    ``use_batch_stats=True`` reproduces the reference quirk of validating in
    train mode when batch_size == 1 (batch statistics instead of running
    averages; running stats are NOT updated here).
    """

    def eval_step(state: TrainState, chunk):
        x = encode_input(chunk, encoding=encoding, polarity=polarity,
                         norm_input=norm_input, spike_th=spike_th)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if use_batch_stats:
            out, _ = state.apply_fn(variables, x, True,
                                    mutable=["batch_stats"],
                                    rngs={"droppath": jax.random.PRNGKey(0)})
        else:
            out = state.apply_fn(variables, x, False)
        return out["flow"]

    return jax.jit(eval_step)
