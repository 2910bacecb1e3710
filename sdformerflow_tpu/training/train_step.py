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
from .optim import GradNormGuardState


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
        # jitted: eager optax init is ~1k tiny zeros_like dispatches, which
        # is minutes through the axon tunnel
        opt_state = jax.jit(tx.init)(params)
        return cls(step=0, params=params, batch_stats=batch_stats,
                   opt_state=opt_state, apply_fn=apply_fn, tx=tx)


def create_train_state(model, tx, sample_chunk, rng, train: bool = True):
    """Initialize model variables + optimizer state.

    The init is jitted: eager ``model.init`` dispatches thousands of tiny
    ops, which through the axon tunnel costs minutes per launch (observed as
    a flood of jit__take/jit__einsum compile-cache entries)."""
    init_rngs = {"params": rng, "droppath": jax.random.fold_in(rng, 1)}
    variables = jax.jit(
        lambda r, x: model.init(r, x, False))(init_rngs, sample_chunk)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        tx=tx)


def voxelize_batch(events, *, num_bins, height, width, use_pallas=None,
                   presorted=False, mesh=None):
    """On-device event->voxel rasterization for a batch of padded event
    buffers: dict(x, y, t, p, valid) of [B, N] arrays -> signed voxel chunks
    [B, num_bins, H, W]. Runs inside the jitted step — the north-star path
    that replaces the reference's offline CPU preprocessing.

    On TPU the sorted dense Pallas kernel (ops/pallas_voxel.py) is used —
    measured 7.5x faster than the XLA scatter lowering at 2^20 events/window
    with identical accuracy vs an f64 oracle (~1.2e-6); elsewhere (or with
    ``use_pallas=False``) the XLA scatter path is the fallback.

    ``presorted=True`` declares the host packed each buffer row-grouped
    (native.pack_window_sorted: events ordered by clip(trunc(y),-1,H-1),
    padding carrying y >= height) — the kernel then skips its on-device
    lax.sort. Only set it for datasets that advertise
    ``events_presorted``.

    With ``mesh=`` (a Mesh whose ``data`` axis evenly divides B) the batch
    loop runs under ``shard_map`` over the data axis: each device voxelizes
    only its LOCAL batch rows — in particular the Pallas kernel's unrolled
    per-row loop and scalar-prefetch DMAs never cross devices, so the
    multi-chip events path needs no gathers (the reference's nearest surface
    is DataParallel over on-the-fly voxelized MDR batches,
    /root/reference/train_mdr_supervised_SNN.py:124-156)."""
    from ..ops.voxel import voxel_grid_signed

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu", "gpu", "cuda")

    def one(x, y, t, p, valid):
        # t_range from the valid span (padding slots carry the last time)
        t0 = jnp.min(jnp.where(valid, t, jnp.inf))
        t1 = jnp.max(jnp.where(valid, t, -jnp.inf))
        if use_pallas:
            from ..ops.pallas_voxel import voxel_grid_signed_pallas
            return voxel_grid_signed_pallas(
                x, y, t, p, num_bins=num_bins, height=height, width=width,
                valid=valid, t_range=(t0, t1), presorted=presorted)
        return voxel_grid_signed(x, y, t, p, num_bins=num_bins, height=height,
                                 width=width, valid=valid, t_range=(t0, t1))

    def batched(ev):
        if use_pallas:
            # unrolled batch loop: the kernel uses scalar-prefetch + manual
            # DMA, which does not compose with vmap's batching rule
            outs = [one(ev["x"][b], ev["y"][b], ev["t"][b],
                        ev["p"][b], ev["valid"][b])
                    for b in range(ev["x"].shape[0])]
            return jnp.stack(outs)
        return jax.vmap(one)(ev["x"], ev["y"], ev["t"], ev["p"], ev["valid"])

    if mesh is not None and mesh.shape.get("data", 1) > 1 \
            and events["x"].shape[0] % mesh.shape["data"] == 0:
        from jax.sharding import PartitionSpec as P
        # check_vma off: pallas_call outputs don't carry varying-mesh-axes
        # metadata, and the body is elementwise-per-row (no collectives)
        return jax.shard_map(batched, mesh=mesh, in_specs=(P("data"),),
                             out_specs=P("data"), check_vma=False)(events)
    return batched(events)


def make_train_step(*, encoding="voxel", polarity=True, norm_input="minmax",
                    spike_th=None, flow_scaling=1.0, gamma=None,
                    mask_events=False, donate=True, voxelize=None,
                    compute_dtype=None, remat=None, crop=None):
    """Build the jitted train step. ``batch`` is a dict with
    chunk [B, bins, H, W] (signed voxels) or [B, bins, 2, H, W],
    label [B, 2, H, W], mask [B, 1, H, W].

    With ``voxelize=dict(num_bins, height, width)`` the batch instead carries
    raw padded event buffers under ``events`` (x/y/t/p/valid, [B, N]) and the
    voxel grids are rasterized on-device inside this jitted step.

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in bf16 with
    f32 master params and f32 loss/gradient accumulation — the TPU
    equivalent of the reference's AMP autocast (no GradScaler needed,
    bf16 has f32's exponent range).
    """

    def loss_fn(params, state, chunk, label, mask, rng):
        if compute_dtype is not None:
            # cast params/activations only; batch_stats stay f32 (the norm
            # layers compute statistics in f32 regardless of input dtype)
            cast_params = jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype), params)
            chunk = chunk.astype(compute_dtype)
        else:
            cast_params = params
        out, mutated = state.apply_fn(
            {"params": cast_params, "batch_stats": state.batch_stats},
            chunk, True, mutable=["batch_stats"], rngs={"droppath": rng})
        flows = [f.astype(jnp.float32) for f in out["flow"]]
        loss = flow_loss_supervised(flows, label, mask,
                                    flow_scaling=flow_scaling, gamma=gamma)
        return loss, mutated["batch_stats"]

    if remat is not None:
        # rematerialization policy for the backward pass:
        #   "dots"  — save conv/matmul outputs, recompute elementwise chains
        #             (BN affines, PSN mixes, spikes) during the backward
        #   "none_saveable" / "all" — recompute everything (min memory)
        policy = {"dots": jax.checkpoint_policies.checkpoint_dots,
                  "dots_no_batch": (jax.checkpoint_policies
                                    .dots_with_no_batch_dims_saveable),
                  "all": jax.checkpoint_policies.nothing_saveable}[remat]
        loss_fn = jax.checkpoint(loss_fn, policy=policy)

    def train_step(state: TrainState, batch, rng):
        if voxelize is not None and "events" in batch:
            chunk = voxelize_batch(batch["events"], **voxelize)
            if crop is not None:
                # events train protocol: voxelize at sensor resolution,
                # center crop to the training size inside the same jitted
                # step (labels/masks arrive already cropped) — symmetric
                # with make_eval_step's crop
                ch, cw = crop
                H, W = chunk.shape[-2:]
                y0, x0 = (H - ch) // 2, (W - cw) // 2
                chunk = chunk[..., y0:y0 + ch, x0:x0 + cw]
        else:
            chunk = batch["chunk"]
        if chunk.ndim == 4 or encoding == "voxel":
            x = encode_input(chunk, encoding=encoding, polarity=polarity,
                             norm_input=norm_input, spike_th=spike_th)
        else:
            x = chunk
        mask = batch["mask"]
        if mask_events:
            # encoded-chunk footprint: matches the reference's live forms —
            # DSEC SNN train sum(sum(chunk,1),1,keepdim).bool() on 5D
            # (train_flow_parallel_supervised_SNN.py:303-306) and the ANN
            # loops' unsqueeze(sum(chunk,1).bool(),1) on 4D
            # (train_flow_parallel_supervised.py:248-250). Known deviation,
            # dormant: train_mdr_supervised_SNN.py:272-274 applies
            # unsqueeze(sum(chunk,1).bool(),1) to the 5D chunk, yielding a
            # per-POLARITY [B,1,2,H,W] mask; every shipped MDR config has
            # metrics.mask_events False, so that quirk is unreachable.
            axes = (1, 2) if x.ndim == 5 else (1,)
            event_mask = (x.sum(axis=axes) != 0)  # [B, H, W]
            mask = mask * event_mask[:, None].astype(mask.dtype)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, x, batch["label"], mask, rng)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        # reuse the single fused norm pass from clip_and_skip_by_global_norm
        # (optim.py) instead of a third full-tree reduction; fall back for
        # custom tx stacks (e.g. MultiSteps, SGD tests) that don't carry it
        gnorm = (new_opt.grad_norm
                 if isinstance(new_opt, GradNormGuardState)
                 else optax.global_norm(grads))
        metrics = {"loss": loss, "grad_norm": gnorm}
        return dataclasses.replace(state, step=state.step + 1,
                                   params=new_params, batch_stats=new_bs,
                                   opt_state=new_opt), metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(*, encoding="voxel", polarity=True, norm_input="minmax",
                   spike_th=None, use_batch_stats=False, compute_dtype=None,
                   collect_spike_rates=False, voxelize=None,
                   fused_embed=False, num_steps=None, crop=None):
    """Build the jitted eval step returning the finest flow prediction.

    With ``voxelize=dict(num_bins, height, width)`` the step accepts a dict
    of raw padded event buffers (x/y/t/p/valid, [B, N]) instead of a voxel
    chunk and rasterizes on-device (Pallas on TPU) — symmetric with
    make_train_step's events path.

    ``use_batch_stats=True`` reproduces the reference quirk of validating in
    train mode when batch_size == 1 (batch statistics instead of running
    averages). Deliberate deviation: torch train-mode forwards also UPDATE
    the BN running stats during validation (train_..._SNN.py:382-385 +
    torch BN semantics); here the mutated stats are discarded so validation
    never contaminates training state.

    ``compute_dtype=jnp.bfloat16`` runs the bf16 inference path (params and
    activations cast; flow returned in f32).

    ``collect_spike_rates=True`` returns (flows, spike_rates) where
    spike_rates is the per-neuron-site firing-rate dict sown by
    SpikingNeuron (reference firing-rate monitors).

    ``fused_embed=True`` (TPU inference fast path) computes the patch embed
    via the channels-second Pallas kernels (ops/pallas_embed.py) and feeds
    the model through its ``pre_embedded`` input. Only valid for the
    Spikingformer models with the MS_PED embed, PSN neurons, running-stats
    BN, and ``use_batch_stats=False``; requires ``num_steps``.
    """
    if fused_embed:
        assert not use_batch_stats, "fused_embed needs running-stats BN"
        assert num_steps is not None

    def eval_step(state: TrainState, chunk):
        if voxelize is not None and isinstance(chunk, dict):
            chunk = voxelize_batch(chunk, **voxelize)
        if crop is not None:
            # DSEC eval protocol: voxelize at sensor resolution, then center
            # crop (eval_DSEC_flow_SNN.py:199-217) — here both happen inside
            # the same jitted step
            ch, cw = crop
            H, W = chunk.shape[-2:]
            y0, x0 = (H - ch) // 2, (W - cw) // 2
            chunk = chunk[..., y0:y0 + ch, x0:x0 + cw]
        x = encode_input(chunk, encoding=encoding, polarity=polarity,
                         norm_input=norm_input, spike_th=spike_th)
        params, bs = state.params, state.batch_stats
        if compute_dtype is not None:
            # batch_stats stay f32: norms compute statistics in f32
            params = jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype), params)
            x = x.astype(compute_dtype)
        variables = {"params": params, "batch_stats": bs}
        kwargs = {}
        if fused_embed:
            from ..ops.pallas_embed import fused_embed_forward
            ep = params["sttmultires_unet"]["encoders"]["patch_embed"]
            es = (bs.get("sttmultires_unet", {}).get("encoders", {})
                  .get("patch_embed", {}))
            kwargs["pre_embedded"] = fused_embed_forward(
                ep, es, x, num_steps=num_steps)
        mutable = ["batch_stats"] if use_batch_stats else []
        if collect_spike_rates:
            mutable = mutable + ["intermediates"]
        if mutable:
            out, mutated = state.apply_fn(
                variables, x, use_batch_stats, mutable=mutable,
                rngs={"droppath": jax.random.PRNGKey(0)}, **kwargs)
        else:
            out = state.apply_fn(variables, x, False, **kwargs)
            mutated = {}
        flows = [f.astype(jnp.float32) for f in out["flow"]]
        if collect_spike_rates:
            return flows, mutated.get("intermediates", {})
        return flows

    return jax.jit(eval_step)
