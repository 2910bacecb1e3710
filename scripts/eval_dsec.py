#!/usr/bin/env python
"""DSEC evaluation driver: center-crop protocol, AEE/PE/outlier/AAE metrics
on the GT-valid mask, optional visualization + test-server submission PNGs.

Replaces /root/reference/eval_DSEC_flow_SNN.py. The train config (model
architecture) and the eval config (protocol) are merged, mirroring the
reference's MLflow config merge. Run:

    python scripts/eval_dsec.py --train_config configs/train_dsec_sdformerflow_en4.yaml \
        --eval_config configs/valid_dsec.yaml --ckpt runs/en4/ckpt [--synthetic]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sdformerflow_tpu.data.augmentation import center_crop  # noqa: E402
from sdformerflow_tpu.data.dsec import batch_iterator  # noqa: E402
from sdformerflow_tpu.models import get_model  # noqa: E402
from sdformerflow_tpu.ops.normalization import encode_input  # noqa: E402
from sdformerflow_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from sdformerflow_tpu.training.config import (build_configs,  # noqa: E402
                                              load_config, merge_eval_config)
from sdformerflow_tpu.training.checkpoints import restore_checkpoint  # noqa: E402
from sdformerflow_tpu.training.evaluate import (MetricsAccumulator,  # noqa: E402
                                                make_metrics_fn)
from sdformerflow_tpu.training.optim import build_optimizer  # noqa: E402
from sdformerflow_tpu.training.train_step import (create_train_state,  # noqa: E402
                                                  make_eval_step)
from sdformerflow_tpu.utils.logging import RunLogger  # noqa: E402


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_config", required=True)
    ap.add_argument("--eval_config", default=None)
    ap.add_argument("--ckpt", default=None, help="checkpoint dir")
    ap.add_argument("--torch_ckpt", default=None,
                    help="reference torch checkpoint (.pt/.pth) converted "
                         "on the fly via training.torch_interop")
    ap.add_argument("--run_dir", default="runs/eval_dsec")
    ap.add_argument("--path", default=None, help="override data.path")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--structured", action="store_true",
                    help="with --synthetic: the learnable moving-bar task "
                         "(matches train_dsec.py --structured), so AEE "
                         "reflects actual flow prediction")
    ap.add_argument("--store_submission", action="store_true",
                    help="write DSEC test-server 16-bit PNGs")
    ap.add_argument("--store_vis", action="store_true")
    ap.add_argument("--show", action="store_true",
                    help="live per-batch cv2 windows (input events / "
                         "estimated flow / GT flow), the reference's "
                         "Visualization_DSEC.update surface "
                         "(utils/visualization.py:32-121); no-op with a "
                         "warning on headless hosts")
    ap.add_argument("--show_px", type=int, default=400,
                    help="live window size (reference vis.px)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 inference path")
    ap.add_argument("--store_spike_rates", action="store_true",
                    help="record per-neuron-site firing rates (SNN only)")
    ap.add_argument("--energy_report", action="store_true",
                    help="firing-rate-weighted SynOps energy estimate "
                         "(Spikformer convention; MS spikingformer family; "
                         "implies --store_spike_rates)")
    ap.add_argument("--store_membrane", action="store_true",
                    help="record per-neuron-site membrane statistics "
                         "(mean/std/max per timestep; reference "
                         "vis.monitor_v, eval_DSEC_flow_SNN.py:145-149)")
    ap.add_argument("--s2d_embed", action="store_true",
                    help="exact space-to-depth embed re-expression (+13%% "
                         "TPU forward, training/s2d_embed.py); exact for "
                         "the eval protocol's running-stats BN")
    ap.add_argument("--fused_attn", action="store_true",
                    help="fused Pallas spiking-QK window attention "
                         "(ops/pallas_attn.py; inference-only, PSN+BN, "
                         "identical variable tree — composes with "
                         "--s2d_embed; incompatible with --log_attn)")
    ap.add_argument("--log_attn", action="store_true",
                    help="store per-stage attention maps of the first batch")
    ap.add_argument("--max_batches", type=int, default=None,
                    help="cap the eval loop (the reference eval runs the "
                         "full dataset — test.sample caps only in-training "
                         "validation; this cap is ours, for smoke runs)")
    args = ap.parse_args()

    config = load_config(args.train_config)
    if args.eval_config:
        config = merge_eval_config(config, load_config(args.eval_config))
    if args.path:
        config["data"]["path"] = args.path

    model_cfg, swin_cfg, spiking_cfg = build_configs(config)
    if args.store_membrane:
        spiking_cfg = spiking_cfg.replace(store_v_seq=True)
    name = config["model"]["name"]
    model = get_model(name, model_cfg, swin_cfg, spiking_cfg)

    encoding = config["model"].get("encoding", "voxel")
    is_snn = "Spiking" in name
    polarity = config["loader"].get("polarity", True) and is_snn
    norm_input = config["model"].get("norm_input")
    spike_th = config["data"].get("spike_th")
    crop = config["loader"].get("crop")
    batch_size = config["loader"]["batch_size"]

    # raw-event-list mode: on-device voxelization (Pallas on TPU) + in-step
    # center crop instead of preprocessed voxel tensors (reference offline
    # equivalent: DSEC_dataloader/DSEC_dataset_preprocess.py feeding
    # eval_DSEC_flow_SNN.py:199-217)
    events_mode = (config["data"].get("events_input") == "list"
                   or not config["data"].get("preprocessed", True))
    if args.synthetic:
        res = config["loader"]["resolution"]
        kw = dict(num_samples=16, num_bins=config["model"]["num_bins"],
                  height=res[0], width=res[1], seed=7,
                  structured=args.structured)
        if events_mode:
            from sdformerflow_tpu.data.dsec import SyntheticEventListDataset
            dataset = SyntheticEventListDataset(**kw)
        else:
            from sdformerflow_tpu.data.dsec import SyntheticEventFlowDataset
            dataset = SyntheticEventFlowDataset(**kw)
    elif events_mode:
        from sdformerflow_tpu.data.dsec import DSECEventListDataset
        dataset = DSECEventListDataset(config, "valid")
    else:
        from sdformerflow_tpu.data.dsec import DSECDatasetLite
        dataset = DSECDatasetLite(config, "valid")

    # init + optionally restore
    sample, _, label0 = dataset[0]
    voxelize = None
    if isinstance(sample, dict):
        full_hw = label0.shape[-2:]
        voxelize = dict(num_bins=config["data"].get("num_frames", 10),
                        height=full_hw[0], width=full_hw[1],
                        presorted=bool(getattr(dataset, "events_presorted",
                                               False)))
        h, w = crop if crop else full_hw
        sample_b = jnp.zeros(
            (batch_size, voxelize["num_bins"], h, w))
    else:
        h, w = crop if crop else sample.shape[-2:]
        sample_b = jnp.zeros((batch_size,) + sample.shape[:-2] + (h, w))
    sample_enc = encode_input(sample_b, encoding=encoding, polarity=polarity,
                              norm_input=norm_input, spike_th=spike_th)
    tx = build_optimizer(lr=1e-4, steps_per_epoch=1)
    state = create_train_state(model, tx, sample_enc, jax.random.PRNGKey(0))
    if args.ckpt:
        state, epoch = restore_checkpoint(args.ckpt, state)
        print(f"restored checkpoint epoch {epoch}")
    elif args.torch_ckpt:
        import dataclasses
        from sdformerflow_tpu.training import torch_interop as TI
        sd = TI.load_torch_checkpoint(args.torch_ckpt)
        depths = swin_cfg.depths
        params, bs, unmatched = TI.convert_state_dict(
            sd, num_stages=len(depths), max_depth=max(depths),
            num_encoders=len(depths),
            family="ann" if not is_snn else "snn")
        if unmatched:
            print(f"warning: {len(unmatched)} torch keys unmatched, e.g. "
                  f"{unmatched[:5]}")
        state = dataclasses.replace(state, params=params, batch_stats=bs)
        print(f"converted torch checkpoint {args.torch_ckpt}")

    if args.s2d_embed:
        from sdformerflow_tpu.training.s2d_embed import s2d_state
        model, state = s2d_state(model, state)
        print("s2d embed re-expression on")
    if args.fused_attn:
        import dataclasses as _dc
        assert not args.log_attn, (
            "--fused_attn does not materialize attention maps")
        model = model.clone(cfg=model.cfg.replace(fused_qk_attn=True))
        state = _dc.replace(state, apply_fn=model.apply)
        print("fused Pallas QK attention on")
    if args.energy_report:
        args.store_spike_rates = True
    collect_sites = args.store_spike_rates or args.store_membrane
    eval_step = make_eval_step(
        encoding=encoding, polarity=polarity, norm_input=norm_input,
        spike_th=spike_th,
        # the standalone eval protocol always runs in eval mode (running-stat
        # BN): eval_DSEC_flow_SNN.py:125 model.eval(). The batch-1
        # train-mode-BN quirk belongs ONLY to in-training validation
        # (train_flow_parallel_supervised_SNN.py:382-385 -> train_loop)
        use_batch_stats=False,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        collect_spike_rates=collect_sites, voxelize=voxelize,
        crop=tuple(crop) if (voxelize and crop) else None)

    vis = None
    if args.store_vis or args.store_submission:
        from sdformerflow_tpu.utils.visualization import (AsyncVisWriter,
                                                          FlowVisualizer)
        # fetch + PNG encode run on a background thread so artifact writing
        # does not serialize the eval dispatch loop
        vis = AsyncVisWriter(FlowVisualizer(f"{args.run_dir}/vis",
                                            store=True))
    live = None
    if args.show:
        from sdformerflow_tpu.utils.visualization import LiveViewer
        live = LiveViewer(px=args.show_px)
        if not live.enabled:
            print("[eval] --show: no GUI backend on this host; live "
                  "windows disabled (use --store_vis for PNG artifacts)")

    metric_names = config["metrics"].get("name", ["AEE"])
    mask_events = config["metrics"].get("mask_events", False)
    # reference protocol (eval_DSEC_flow_SNN.py:237-240): the event mask is
    # the ENCODED chunk's footprint — recomputed inside metrics_fn with the
    # eval step's own encode args. Raw-events mode voxelizes+crops in-step,
    # so the chunk never exists host-side; that combination has no reference
    # counterpart (the reference eval is offline-voxel only) and mask_events
    # is skipped there (metrics_fn receives chunk=None via the dict guard).
    metrics_fn = make_metrics_fn(
        metric_names=metric_names,
        flow_scaling=config["metrics"].get("flow_scaling", 1.0),
        mask_events=mask_events, encoding=encoding, polarity=polarity,
        norm_input=norm_input, spike_th=spike_th)
    acc = MetricsAccumulator()
    spike_rates = None
    membrane = None
    for i, batch in enumerate(batch_iterator(
            dataset, batch_size, drop_last=False,
            workers=config["loader"].get("n_workers", 0))):
        if args.max_batches is not None and i >= args.max_batches:
            break
        label = jnp.asarray(batch["label"])
        mask = jnp.asarray(batch["mask"])
        if "events" in batch:
            chunk = jax.tree_util.tree_map(jnp.asarray, batch["events"])
            if crop:
                # crop GT/mask on host; the voxel crop happens in-step
                _, label, mask = center_crop(label[:, :1] * 0, label, mask,
                                             tuple(crop))
        else:
            chunk = jnp.asarray(batch["chunk"])
            if crop:
                chunk, label, mask = center_crop(chunk, label, mask,
                                                 tuple(crop))
        step_out = eval_step(state, chunk)
        if collect_sites:
            flows, sites = step_out
            if i == 0:
                flat = jax.tree_util.tree_flatten_with_path(sites)[0]
                keyed = {
                    "/".join(str(getattr(p, "key", p)) for p in path): v
                    for path, v in flat}
                if args.store_spike_rates:
                    spike_rates = {
                        k: float(np.asarray(v).mean())
                        for k, v in keyed.items() if "spike_rate" in k}
                if args.store_membrane:
                    # [T, 3] per site: (mean, std, max) per timestep
                    membrane = {
                        k: np.asarray(v, np.float32).reshape(-1, 3).tolist()
                        for k, v in keyed.items() if "membrane" in k}
        else:
            flows = step_out
        pred = flows[-1]
        acc.append(metrics_fn(pred, label, mask,
                              None if isinstance(chunk, dict) else chunk),
                   label.shape[0])
        if vis is not None:
            # device arrays handed off as-is; the writer thread fetches
            vis.update(flow=pred[0], gt_flow=label[0],
                       submission_flow=(pred[0] if args.store_submission
                                        else None))
        if live is not None and live.enabled:
            # reference shows per-polarity input events alongside the flows
            # (Visualization_DSEC.update:45-49); the signed voxel chunk
            # splits into ON/OFF footprints by sign
            cnt = None
            if not isinstance(chunk, dict):
                c = np.asarray(chunk[0], np.float32)
                cnt = np.stack([np.maximum(c, 0).sum(0),
                                np.maximum(-c, 0).sum(0)])
            live.update(event_cnt=cnt, flow=np.asarray(pred[0]),
                        gt_flow=np.asarray(label[0]))
        if args.log_attn and i == 0:
            x = encode_input(chunk, encoding=encoding, polarity=polarity,
                             norm_input=norm_input, spike_th=spike_th)
            out = state.apply_fn({"params": state.params,
                                  "batch_stats": state.batch_stats},
                                 x, False, log=True)
            import os
            os.makedirs(args.run_dir, exist_ok=True)
            np.savez(f"{args.run_dir}/attention_maps.npz",
                     **{f"stage{k}": np.asarray(a)
                        for k, a in enumerate(out["attn"] or [])})

    if vis is not None:
        vis.close()  # drain the writer queue; re-raises writer errors
    if live is not None:
        live.close()
    results = acc.results()
    if spike_rates is not None:
        results["mean_firing_rate"] = float(np.mean(list(spike_rates.values())))
    energy = None
    if args.energy_report and spike_rates:
        if name.startswith("MS_Spikingformer"):
            from sdformerflow_tpu.utils.energy import energy_spikingformer
            energy = energy_spikingformer(
                swin_cfg, spike_rates, num_steps=spiking_cfg.num_steps,
                base_channels=model_cfg.get("base_num_channels", 96),
                num_encoders=model.num_encoders,
                num_ch=2 if polarity else 1,
                kernel_size=model_cfg.get("kernel_size", 3))
            results["energy_mj"] = energy["energy_mj"]
            results["snn_vs_ann_ratio"] = energy["snn_vs_ann_ratio"]
        else:
            print(f"--energy_report: SynOps mapping is scoped to the "
                  f"MS spikingformer family (got {name}); skipped")
    logger = RunLogger(args.run_dir, config)
    logger.log_artifact_dict("results.json", results)
    if spike_rates is not None:
        logger.log_artifact_dict("spike_rates.json", spike_rates)
    if energy is not None:
        logger.log_artifact_dict("energy.json", energy)
        print(f"energy: {energy['energy_mj']:.3f} mJ/forward "
              f"({energy['snn_vs_ann_ratio']:.3f}x of the "
              f"all-MAC ANN equivalent)")
    if membrane is not None:
        logger.log_artifact_dict("membrane_stats.json", membrane)
    logger.close()
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
