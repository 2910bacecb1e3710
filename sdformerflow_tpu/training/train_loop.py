"""Config-driven supervised training loop (DSEC / MDR).

Mirrors the reference drivers' structure
(/root/reference/train_flow_parallel_supervised_SNN.py:29-494 and the
ANN/MDR variants) in one reusable loop:
- model built from the registry (no eval()),
- AdamW + MultiStepLR(0.5) + global-norm clip + grad accumulation,
- per-batch: augmentation -> on-device input encoding -> jitted train step
  (forward/backward/update fused into one XLA program),
- NaN-loss guard, epoch-best checkpointing, validation every ``n_valid``
  epochs (capped at ``test.sample`` batches; batch_size==1 validates with
  batch statistics — reference quirk),
- data-parallel over the device mesh: batch sharded, params replicated.
"""

from __future__ import annotations

import math
import signal
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augmentation import build_train_augmentation, center_crop
from ..data.dsec import batch_iterator
from ..losses import flow_loss_supervised
from ..models import get_model
from ..ops.normalization import encode_input
from ..parallel import make_mesh, replicate
from ..parallel.mesh import prefetch_to_device
from ..utils.logging import RunLogger, count_parameters
from .checkpoints import restore_checkpoint, save_checkpoint
from .config import build_configs
from .optim import build_optimizer
from .train_step import create_train_state, make_eval_step, make_train_step


def _sample_shape_batch(config, dataset):
    chunk, mask, label = dataset[0]
    crop = config["loader"].get("crop")
    b = config["loader"]["batch_size"]
    if isinstance(chunk, dict):
        # raw-events item: the model sees voxel grids of the label's
        # spatial size at data.num_frames bins
        h, w = label.shape[-2:]
        return np.zeros((b, config["data"].get("num_frames", 10), h, w),
                        np.float32)
    if crop is not None:
        h, w = crop
    else:
        h, w = chunk.shape[-2:]
    shape = chunk.shape[:-2] + (h, w)
    return np.zeros((b,) + shape, np.float32)


def _events_voxelize_cfg(config, dataset):
    """voxelize kwargs for make_train_step/make_eval_step when the dataset
    yields raw event lists (data.events_input == 'list' or
    data.preprocessed == false with list tensors)."""
    chunk, mask, label = dataset[0]
    if not isinstance(chunk, dict):
        return None
    h, w = label.shape[-2:]
    return dict(num_bins=config["data"].get("num_frames", 10),
                height=h, width=w,
                # datasets whose packer row-groups events (counting sort on
                # the host) let the Pallas voxelizer skip its on-device sort
                presorted=bool(getattr(dataset, "events_presorted", False)))


def train(config: dict, train_dataset, valid_dataset=None, *,
          run_dir: str = "runs/default", resume: bool = False,
          max_steps: Optional[int] = None):
    # Preemption-safe shutdown: SIGTERM (what cluster schedulers send
    # before a kill) sets a flag; the step loop drains pending losses,
    # checkpoints the CURRENT state at the in-progress epoch, and returns
    # cleanly — ``--resume`` continues at the next epoch. Installed at
    # ENTRY so a signal landing during model build / compilation (minutes
    # through the TPU tunnel) is caught too. The reference has no
    # equivalent (a preempted run loses everything since the last
    # best-epoch save, /root/reference/utils/utils.py:93-104).
    # Single-host semantics; a multi-host orchestrator must deliver
    # SIGTERM to every process (each saves via the same path it uses for
    # best-epoch saves). Opt out with loader.save_on_preempt: false.
    preempt_sig: dict = {}
    prev_sigterm = None
    if (config["loader"].get("save_on_preempt", True)
            and threading.current_thread() is threading.main_thread()):
        prev_sigterm = signal.signal(
            signal.SIGTERM, lambda s, f: preempt_sig.setdefault("sig", s))
    try:
        return _train(config, train_dataset, valid_dataset,
                      run_dir=run_dir, resume=resume, max_steps=max_steps,
                      preempt_sig=preempt_sig)
    finally:
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)


def _train(config: dict, train_dataset, valid_dataset=None, *,
           run_dir: str = "runs/default", resume: bool = False,
           max_steps: Optional[int] = None, preempt_sig: Optional[dict] = None):
    preempt_sig = {} if preempt_sig is None else preempt_sig
    model_cfg, swin_cfg, spiking_cfg = build_configs(config)
    loader = config["loader"]
    loss_cfg = config["loss"]
    opt_cfg = config["optimizer"]
    name = config["model"]["name"]

    model = get_model(name, model_cfg, swin_cfg, spiking_cfg)

    batch_size = loader["batch_size"]
    # multi-host: batch_size is the GLOBAL batch; each process feeds its
    # local shard (the reference is single-process — SURVEY §2.10; the
    # DistributedSampler equivalent is ProcessShardedDataset)
    n_proc = jax.process_count()
    local_bs = batch_size
    if n_proc > 1:
        from ..parallel import multihost as MH
        if batch_size % n_proc:
            raise ValueError(
                f"global batch_size {batch_size} must be divisible by "
                f"process_count {n_proc}")
        local_bs = batch_size // n_proc
        train_dataset = MH.ProcessShardedDataset(train_dataset)
        if valid_dataset is not None:
            valid_dataset = MH.ProcessShardedDataset(valid_dataset)
    steps_per_epoch = max(len(train_dataset) // local_bs, 1)
    tx = build_optimizer(
        name=opt_cfg.get("name", "AdamW"), lr=opt_cfg.get("lr", 1e-4),
        weight_decay=opt_cfg.get("wd", 0.01),
        scheduler=opt_cfg.get("scheduler", "multistep"),
        milestones=opt_cfg.get("milestones", ()),
        steps_per_epoch=steps_per_epoch,
        n_epochs=loader.get("n_epochs", 60),
        clip_grad=loss_cfg.get("clip_grad"),
        num_acc=opt_cfg.get("num_acc", 1))

    encoding = config["model"].get("encoding", "voxel")
    polarity = loader.get("polarity", True)
    norm_input = config["model"].get("norm_input")
    spike_th = config["data"].get("spike_th")
    is_snn = "Spiking" in name

    # Known-fatal combination guard: optimizer.remat at per-device batch >= 8
    # on the ANN family crashes the TPU worker (the recompute graph of the
    # full-resolution embed band OOMs — measured, PERF_NOTES.md round 4
    # "batch/remat matrix"). Fail fast with the measured evidence instead of
    # letting the device die mid-epoch. Per-DEVICE batch is what matters: an
    # 8-sample global batch on an 8-chip data-parallel mesh runs batch 1 per
    # chip, where remat is the measured optimum (80.1 ms vs 105.7).
    if opt_cfg.get("remat") and not is_snn:
        if n_proc > 1:
            _n_data = n_proc  # one local device per process (multihost.py)
        else:
            _n_data = loader.get("n_data") or math.gcd(batch_size,
                                                       len(jax.devices()))
        per_device_batch = batch_size // max(_n_data, 1)
        if per_device_batch >= 8:
            raise ValueError(
                f"optimizer.remat={opt_cfg['remat']!r} with per-device batch "
                f"{per_device_batch} (global {batch_size} over {_n_data} "
                "data-parallel devices) on the ANN family crashes the TPU "
                "worker: the rematerialized backward of the full-resolution "
                "embed band OOMs (measured, PERF_NOTES.md round-4 batch/remat "
                "matrix). Drop optimizer.remat (batch 8 plain is the "
                "throughput optimum, 41.2 ms/window) or reduce the per-device "
                "batch below 8.")

    sample = _sample_shape_batch(config, train_dataset)
    sample_enc = encode_input(jnp.asarray(sample), encoding=encoding,
                              polarity=polarity and is_snn,
                              norm_input=norm_input, spike_th=spike_th)
    rng = jax.random.PRNGKey(loader.get("seed", 0))
    state = create_train_state(model, tx, sample_enc, rng)

    logger = RunLogger(run_dir, config, enabled=jax.process_index() == 0)
    logger.log_artifact_dict("model_info.json", {
        "model": name, "params": count_parameters(state.params)})

    start_epoch = 0
    if resume:
        state, start_epoch = restore_checkpoint(f"{run_dir}/ckpt", state)
        start_epoch += 1

    if n_proc > 1:
        from ..parallel import multihost as MH
        mesh = MH.make_multihost_mesh()
        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"global batch_size {batch_size} must be divisible by the "
                f"data-axis size {mesh.shape['data']}")
        MH.establish_collectives(mesh)
        state = MH.replicate_global(state, mesh)
        put = lambda b: MH.global_batch(b, mesh)  # noqa: E731
    else:
        # data-axis size must divide the global batch; default to the
        # largest device count that does (a 2-sample batch on an 8-chip
        # host runs dp2, not a shard error). loader.n_data overrides.
        n_data = loader.get("n_data") or math.gcd(batch_size,
                                                  len(jax.devices()))
        mesh = make_mesh(n_data=n_data)
        state = replicate(state, mesh)
        put = None

    voxelize = _events_voxelize_cfg(config, train_dataset)
    if voxelize is not None and mesh.shape.get("data", 1) > 1:
        # multi-device events path: shard_map the voxelizer over the data
        # axis so each device rasterizes only its local batch rows
        # (train_step.voxelize_batch; verified per-leaf-grad-equal to the
        # single-device step in tests/test_multichip_equivalence.py)
        voxelize = dict(voxelize, mesh=mesh)
    train_step = make_train_step(
        encoding=encoding, polarity=polarity and is_snn,
        norm_input=norm_input, spike_th=spike_th,
        flow_scaling=config["metrics"].get("flow_scaling", 1.0),
        gamma=loss_cfg.get("gamma"),
        mask_events=config["metrics"].get("mask_events", False),
        compute_dtype=(jnp.bfloat16 if opt_cfg.get("use_amp") else None),
        # optimizer.remat: "dots" saves conv/matmul outputs and recomputes
        # elementwise chains in the backward — measured -24% on the ANN
        # train step (XLA stops spilling full-res activation copies);
        # closed NEGATIVE for the SNN (PERF_NOTES "Train step round 3/4")
        remat=opt_cfg.get("remat"),
        voxelize=voxelize)
    eval_step = make_eval_step(
        encoding=encoding, polarity=polarity and is_snn,
        norm_input=norm_input, spike_th=spike_th,
        use_batch_stats=batch_size == 1, voxelize=voxelize)

    augment = build_train_augmentation(
        loader.get("augment"), loader.get("augment_prob"),
        crop=loader.get("crop"),
        max_drop_rate=loader.get("max_drop_rate", 0.6),
        rotation_degrees=loader.get("rotation_degrees", (0.0, 0.0)))
    # one fused dispatch per step: key derivation + augmentation (eager
    # fold_in costs a tunnel round-trip per call)
    def _prep(rng_, step_, chunk, label, mask):
        key = jax.random.fold_in(rng_, step_)
        ev, fl, mk = augment(key, chunk, label, mask)
        return ev, fl, mk, jax.random.fold_in(key, 1)

    prep_jit = jax.jit(_prep)
    fold_jit = jax.jit(jax.random.fold_in)

    crop = loader.get("crop")
    n_epochs = loader.get("n_epochs", 60)
    # ``float(loss)`` every step forces a host<->device round trip that
    # serializes the dispatch pipeline (costly through the tunnel; the
    # reference's .item() per step has the same bug on GPU). Keep losses as
    # device scalars and fetch a block at a time: ``sync_every`` bounds how
    # far the host runs ahead and how late a NaN is reported (params are
    # already protected by the optimizer's non-finite skip, optim.py).
    sync_every = loader.get("sync_every", 32)

    try:
        return _train_epochs(
            config, state, train_dataset, valid_dataset, run_dir=run_dir,
            start_epoch=start_epoch, n_epochs=n_epochs, max_steps=max_steps,
            train_step=train_step, eval_step=eval_step, prep_jit=prep_jit,
            fold_jit=fold_jit, rng=rng, mesh=mesh, put=put, crop=crop,
            batch_size=batch_size, local_bs=local_bs, n_proc=n_proc,
            loader=loader, logger=logger, sync_every=sync_every,
            preempt_sig=preempt_sig)
    finally:
        logger.close()


def _train_epochs(config, state, train_dataset, valid_dataset, *, run_dir,
                  start_epoch, n_epochs, max_steps, train_step, eval_step,
                  prep_jit, fold_jit, rng, mesh, put, crop, batch_size,
                  local_bs, n_proc, loader, logger, sync_every, preempt_sig):
    best_loss = math.inf
    global_step = 0

    for epoch in range(start_epoch, n_epochs):
        epoch_loss, n_samples = 0.0, 0
        pending = []  # un-fetched device loss scalars, one per step
        t0 = time.time()

        def _drain():
            nonlocal epoch_loss
            if not pending:
                return
            vals = np.asarray(jax.device_get(jnp.stack(pending)))
            if np.isnan(vals).any():
                bad = global_step - len(pending) + int(
                    np.isnan(vals).argmax())
                raise RuntimeError(f"NaN loss at step {bad}")
            epoch_loss += float(vals.sum()) * batch_size
            pending.clear()

        if n_proc > 1:
            # global shuffle (same seed on every process), then the local
            # contiguous slice — epochs match single-host statistics
            train_dataset.reshard(loader.get("seed", 0) + epoch)
            batches = batch_iterator(train_dataset, local_bs,
                                     workers=loader.get("n_workers", 0))
        else:
            batches = batch_iterator(train_dataset, local_bs, shuffle=True,
                                     seed=loader.get("seed", 0) + epoch,
                                     workers=loader.get("n_workers", 0))
        for batch in prefetch_to_device(batches, mesh, put=put):
            if "events" in batch:
                # raw-events path: voxelization happens on device inside the
                # jitted train step; voxel-space augmentation does not apply
                step_key = fold_jit(rng, global_step)
            else:
                ev, fl, mk, step_key = prep_jit(
                    rng, global_step, batch["chunk"], batch["label"],
                    batch["mask"])
                batch = {"chunk": ev, "label": fl, "mask": mk}
            state, metrics = train_step(state, batch, step_key)
            pending.append(metrics["loss"])
            n_samples += batch_size
            global_step += 1
            if len(pending) >= sync_every:
                _drain()
            if max_steps is not None and global_step >= max_steps:
                break
            if preempt_sig:
                break
        _drain()

        if preempt_sig:
            partial = epoch_loss / max(n_samples, 1)
            save_checkpoint(f"{run_dir}/ckpt", state, epoch,
                            metrics={"train_loss": partial,
                                     "preempted": 1.0})
            logger.log_metric("preempted_at_epoch", float(epoch), epoch)
            break

        epoch_loss /= max(n_samples, 1)
        logger.log_metric("train_loss", epoch_loss, epoch)
        logger.log_metric("epoch_time_s", time.time() - t0, epoch)

        if epoch_loss < best_loss:
            save_checkpoint(f"{run_dir}/ckpt", state, epoch,
                            metrics={"train_loss": epoch_loss})
            best_loss = epoch_loss

        if (valid_dataset is not None
                and epoch % config["test"].get("n_valid", 5) == 0):
            vloss = validate(config, state, eval_step, valid_dataset,
                             crop=crop, batch_size=local_bs, put=put)
            logger.log_metric("valid_loss", vloss, epoch)

        if max_steps is not None and global_step >= max_steps:
            break

    return state


def validate(config, state, eval_step, dataset, crop=None, batch_size=None,
             put=None):
    """Mean per-batch validation loss.

    NB the loss VALUE is batch-size dependent by reference design:
    mod_loss_function divides each sample's masked error sum by the
    batch-GLOBAL valid count, then means over batch
    (/root/reference/loss/flow_supervised.py:14-31,95-102), so loss scales
    ~1/batch. Multi-host validation therefore must run on the assembled
    GLOBAL batch (``put``, the same pipeline as training) — evaluating
    local shards separately and averaging would report process_count x the
    single-host value.
    """
    loader = config["loader"]
    batch_size = batch_size or loader["batch_size"]
    # reference cap: breaks AFTER the batch that makes sample exceed
    # test.sample // batch_size (train_..._SNN.py:478-480), i.e. it runs
    # sample//B + 1 batches, not sample
    max_batches = config["test"].get("sample", 40) // batch_size + 1
    losses, count = [], 0
    flow_scaling = config["metrics"].get("flow_scaling", 1.0)
    # the reference validates on the FINEST flow only
    # (train_flow_parallel_supervised_SNN.py:456,475 — loss_function([pred])
    # with pred = flow[-1]), unlike training which averages all scales; and
    # with metrics.mask_events it masks by the ENCODED chunk's nonzero
    # footprint (:470-473), recomputed here with the same encode_input args
    # as the eval step
    mask_events = config["metrics"].get("mask_events", False)
    encoding = config["model"].get("encoding", "voxel")
    polarity = (loader.get("polarity", True)
                and "Spiking" in config["model"]["name"])
    norm_input = config["model"].get("norm_input")
    spike_th = config["data"].get("spike_th")

    def _loss(fl, la, mk, chunk):
        if mask_events and not isinstance(chunk, dict):
            from .evaluate import event_footprint_mask
            x = encode_input(chunk, encoding=encoding, polarity=polarity,
                             norm_input=norm_input, spike_th=spike_th)
            mk = event_footprint_mask(mk, x)
        return flow_loss_supervised([fl[-1]], la, mk,
                                    flow_scaling=flow_scaling)

    loss_jit = jax.jit(_loss)
    for i, batch in enumerate(batch_iterator(
            dataset, batch_size, workers=loader.get("n_workers", 0))):
        if i >= max_batches:
            break
        label = jnp.asarray(batch["label"])
        mask = jnp.asarray(batch["mask"])
        if "events" in batch:
            # raw-events path: on-device voxelize inside eval_step (crop on
            # voxels is not applied here — events validation runs full-res)
            chunk = jax.tree_util.tree_map(jnp.asarray, batch["events"])
            if put is not None:
                g = put({"events": batch["events"], "label": batch["label"],
                         "mask": batch["mask"]})
                chunk, label, mask = g["events"], g["label"], g["mask"]
        else:
            chunk = jnp.asarray(batch["chunk"])
            if crop is not None:
                chunk, label, mask = center_crop(chunk, label, mask,
                                                 tuple(crop))
            if put is not None:
                g = put({"chunk": np.asarray(chunk),
                         "label": np.asarray(label),
                         "mask": np.asarray(mask)})
                chunk, label, mask = g["chunk"], g["label"], g["mask"]
        flows = eval_step(state, chunk)
        losses.append(loss_jit(flows, label, mask, chunk))  # device scalar
        count += batch_size
    if not losses:
        return 0.0
    total = float(np.asarray(jax.device_get(jnp.stack(losses))).sum())
    return total * batch_size / max(count, 1)
