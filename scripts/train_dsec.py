#!/usr/bin/env python
"""Supervised DSEC training driver (ANN STTFlowNet or SNN SDformerFlow,
selected by ``model.name`` in the config).

Replaces /root/reference/train_flow_parallel_supervised.py and
train_flow_parallel_supervised_SNN.py — one driver, the registry picks the
model family. Run:

    python scripts/train_dsec.py --config configs/train_dsec_sdformerflow_en4.yaml \
        --run_dir runs/en4 [--resume] [--synthetic]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sdformerflow_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from sdformerflow_tpu.training.config import load_config  # noqa: E402
from sdformerflow_tpu.training.train_loop import train  # noqa: E402


def main():
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--run_dir", default="runs/dsec")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--path", default=None, help="override data.path")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None,
                    help="override optimizer.lr")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on synthetic data (smoke runs without DSEC)")
    ap.add_argument("--structured", action="store_true",
                    help="learnable synthetic task (moving bar)")
    args = ap.parse_args()

    config = load_config(args.config)
    if args.path:
        config["data"]["path"] = args.path
    if args.lr is not None:
        config["optimizer"]["lr"] = args.lr

    # raw-event-list mode: events are voxelized ON DEVICE (Pallas on TPU)
    # inside the jitted train/eval steps instead of read as preprocessed
    # voxel tensors (reference offline equivalent:
    # DSEC_dataloader/DSEC_dataset_preprocess.py -> train_..._SNN.py:229-299)
    events_mode = (config["data"].get("events_input") == "list"
                   or not config["data"].get("preprocessed", True))
    if args.synthetic:
        res = config["loader"]["resolution"]
        kw = dict(num_bins=config["model"]["num_bins"], height=res[0],
                  width=res[1], structured=args.structured)
        if events_mode:
            from sdformerflow_tpu.data.dsec import SyntheticEventListDataset
            train_ds = SyntheticEventListDataset(num_samples=32, **kw)
            valid_ds = SyntheticEventListDataset(num_samples=8, seed=999,
                                                 **kw)
        else:
            from sdformerflow_tpu.data.dsec import SyntheticEventFlowDataset
            train_ds = SyntheticEventFlowDataset(num_samples=32, **kw)
            valid_ds = SyntheticEventFlowDataset(num_samples=8, seed=999,
                                                 **kw)
    elif events_mode:
        from sdformerflow_tpu.data.dsec import DSECEventListDataset
        train_ds = DSECEventListDataset(config, "train")
        valid_ds = DSECEventListDataset(config, "valid")
    else:
        from sdformerflow_tpu.data.dsec import DSECDatasetLite
        train_ds = DSECDatasetLite(config, "train")
        valid_ds = DSECDatasetLite(config, "valid")

    train(config, train_ds, valid_ds, run_dir=args.run_dir,
          resume=args.resume, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
