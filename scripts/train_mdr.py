#!/usr/bin/env python
"""Supervised MDR training (validated on MVSEC), ANN or SNN by config.

Replaces /root/reference/train_mdr_supervised_SNN.py and
train_mdr_supervised_ANN.py. Augmentation happens host-side inside the MDR
dataset (RAFT-style DenseSparseAugmentor), matching the reference, so the
jittable augmentation pipeline is disabled here.

    python scripts/train_mdr.py --config configs/train_mdr_sdformerflow.yaml \
        --run_dir runs/mdr [--synthetic]
"""

import argparse
import copy
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
    ap.add_argument("--run_dir", default="runs/mdr")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--path", default=None)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    config = load_config(args.config)
    if args.path:
        config["data"]["path"] = args.path

    num_chunks = config["data"].get("num_chunks", 1)
    crop = config["loader"].get("crop")

    if args.synthetic:
        from sdformerflow_tpu.data.dsec import SyntheticEventFlowDataset
        bins = config["data"]["num_frames"] * num_chunks
        train_ds = SyntheticEventFlowDataset(32, bins, crop[0], crop[1])
        valid_ds = SyntheticEventFlowDataset(8, bins, crop[0], crop[1],
                                             seed=99)
    else:
        from sdformerflow_tpu.data.adapters import (MDRChunkAdapter,
                                                    MvsecChunkAdapter)
        from sdformerflow_tpu.data.mdr import MDREventFlow
        train_ds = MDRChunkAdapter(
            MDREventFlow(config, train=True, aug=True), num_chunks,
            train=True)
        if config["data"].get("event_interval", "dt1") == "dt1":
            from sdformerflow_tpu.data.mvsec import MvsecEventFlow
            mv = MvsecEventFlow(config, train=False)
        else:
            from sdformerflow_tpu.data.mvsec import MvsecEventFlow_dt4
            mv = MvsecEventFlow_dt4(config, train=False)
        valid_ds = MvsecChunkAdapter(mv, num_chunks)

    # dataset-side augmentation already crops; disable jittable augmentation
    loop_config = copy.deepcopy(config)
    loop_config["loader"]["augment"] = []
    loop_config["loader"]["crop"] = None
    loop_config["loader"]["resolution"] = list(crop)

    train(loop_config, train_ds, valid_ds, run_dir=args.run_dir,
          resume=args.resume, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
