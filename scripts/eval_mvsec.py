#!/usr/bin/env python
"""MVSEC evaluation (dt1/dt4 cross-dataset transfer): 256x256 center crop,
AEE/AAE on |flow|<1000 validity (outdoor_day1 masks car-hood rows), optional
event-occupancy masking.

Replaces /root/reference/eval_MV_flow_SNN.py. Protocol notes (A/B'd in
tests/test_eval_loop_parity.py):
- metrics.mask_events masks by the ENCODED chunk's nonzero footprint
  (eval_MV_flow_SNN.py:217-219) — NOT the loaders' ``event_valid``
  histogram, which the reference produces but never consumes;
- metrics are summed per sample and divided by the total sample count
  (training/evaluate.py), and the loop runs the FULL dataset — the
  reference eval loop has no ``test.sample`` cap (that caps only the
  in-training validation); use --max_batches for a deliberate cap.

    python scripts/eval_mvsec.py --train_config configs/train_mdr_sdformerflow.yaml \
        --eval_config configs/eval_mvsec.yaml --ckpt runs/mdr/ckpt
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdformerflow_tpu.data.dsec import batch_iterator  # noqa: E402
from sdformerflow_tpu.models import get_model  # noqa: E402
from sdformerflow_tpu.ops.normalization import encode_input  # noqa: E402
from sdformerflow_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from sdformerflow_tpu.training.config import build_configs, load_config  # noqa: E402
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
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--run_dir", default="runs/eval_mvsec")
    ap.add_argument("--path", default=None)
    ap.add_argument("--sequence", default=None,
                    help="override data.test_sequence")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--max_batches", type=int, default=None,
                    help="cap the eval loop (the reference runs the full "
                         "dataset; this cap is ours, for smoke runs)")
    args = ap.parse_args()

    config = load_config(args.train_config)
    if args.eval_config:
        from sdformerflow_tpu.training.config import merge_eval_config
        config = merge_eval_config(config, load_config(args.eval_config))
    if args.path:
        config["data"]["path"] = args.path
    if args.sequence:
        config["data"]["test_sequence"] = args.sequence

    num_chunks = config["data"].get("num_chunks", 1)
    crop = tuple(config["loader"].get("crop", (256, 256)))
    batch_size = config["loader"]["batch_size"]
    mask_events = config["metrics"].get("mask_events", False)

    if args.synthetic:
        from sdformerflow_tpu.data.dsec import SyntheticEventFlowDataset
        bins = config["data"]["num_frames"] * num_chunks
        dataset = SyntheticEventFlowDataset(8, bins, crop[0], crop[1], seed=3)
    else:
        from sdformerflow_tpu.data.adapters import MvsecChunkAdapter
        if config["data"].get("event_interval", "dt1") == "dt1":
            from sdformerflow_tpu.data.mvsec import MvsecEventFlow
            mv = MvsecEventFlow(config, train=False)
        else:
            from sdformerflow_tpu.data.mvsec import MvsecEventFlow_dt4
            mv = MvsecEventFlow_dt4(config, train=False)
        dataset = MvsecChunkAdapter(mv, num_chunks)

    model_cfg, swin_cfg, spiking_cfg = build_configs(config)
    swin_cfg = swin_cfg.replace(input_size=crop)
    name = config["model"]["name"]
    model = get_model(name, model_cfg, swin_cfg, spiking_cfg)
    is_snn = "Spiking" in name
    polarity = config["loader"].get("polarity", True) and is_snn
    norm_input = config["model"].get("norm_input")
    spike_th = config["data"].get("spike_th")

    chunk0, _, _ = dataset[0]
    sample = jnp.zeros((batch_size,) + chunk0.shape, jnp.float32)
    sample_enc = encode_input(sample, polarity=polarity,
                              norm_input=norm_input, spike_th=spike_th)
    tx = build_optimizer(lr=1e-4, steps_per_epoch=1)
    state = create_train_state(model, tx, sample_enc, jax.random.PRNGKey(0))
    if args.ckpt:
        state, epoch = restore_checkpoint(args.ckpt, state)
        print(f"restored checkpoint epoch {epoch}")

    # the standalone eval protocol always runs in eval mode (running-stat
    # BN): eval_MV_flow_SNN.py:142 model.eval(). The batch-1 train-mode-BN
    # quirk belongs ONLY to in-training validation
    # (train_flow_parallel_supervised_SNN.py:382-385 -> train_loop.validate)
    eval_step = make_eval_step(polarity=polarity, norm_input=norm_input,
                               spike_th=spike_th, use_batch_stats=False)

    metrics_fn = make_metrics_fn(
        metric_names=config["metrics"].get("name", ["AEE", "AAE"]),
        flow_scaling=config["metrics"].get("flow_scaling", 1.0),
        mask_events=mask_events, polarity=polarity,
        norm_input=norm_input, spike_th=spike_th)
    acc = MetricsAccumulator()
    for i, batch in enumerate(batch_iterator(
            dataset, batch_size, drop_last=False,
            workers=config["loader"].get("n_workers", 0))):
        if args.max_batches is not None and i >= args.max_batches:
            break
        chunk = jnp.asarray(batch["chunk"])
        flows = eval_step(state, chunk)
        acc.append(metrics_fn(flows[-1], jnp.asarray(batch["label"]),
                              jnp.asarray(batch["mask"]), chunk),
                   chunk.shape[0])

    results = acc.results()
    results["sequence"] = config["data"].get("test_sequence")
    logger = RunLogger(args.run_dir, config)
    logger.log_artifact_dict("results.json", results)
    logger.close()
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
