#!/usr/bin/env python
"""Serving-engine throughput at the DSEC eval protocol scale.

Measures FlowServer end-to-end request rate (host pad/bucket + H2D +
jitted bf16 forward + D2H, pipelined across requests) for:
- voxel requests at the 288x384 crop (the 17.8 ms forward unit), and
- raw-event requests at sensor scale (2^20 events -> on-device 480x640x15
  Pallas voxelize -> crop -> forward; the 35.3 ms/window unit,
  PERF_NOTES "Full-scale events-path eval step").

The pipeline target: request rate ~= 1/step-time, i.e. the serving wrapper
adds no serialization on top of the compute unit.

    python scripts/bench_serving.py [--requests 32] [--events_exp 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--events_exp", type=int, default=20,
                    help="log2 events per raw-event request")
    ap.add_argument("--config",
                    default="configs/train_dsec_sdformerflow_en4.yaml")
    ap.add_argument("--no_events", action="store_true")
    args = ap.parse_args()

    from sdformerflow_tpu.serving import FlowServer
    from sdformerflow_tpu.training.config import load_config
    from sdformerflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = load_config(args.config)
    crop = config["loader"].get("crop") or [288, 384]
    h, w = crop
    res = config["loader"].get("resolution", [480, 640])
    bins = config["data"].get("num_frames", 10)
    n_events = 1 << args.events_exp
    rng = np.random.default_rng(0)

    with FlowServer(config, bf16=True) as server:
        print("compiling...", flush=True)
        t0 = time.perf_counter()
        server.warmup(None if args.no_events else n_events)
        print(f"warmup {time.perf_counter() - t0:.1f}s", flush=True)

        def drive(make_request, label):
            # warm queue depth, then measure steady state
            futs = [server.submit(make_request()) for _ in range(4)]
            [f.result() for f in futs]
            t0 = time.perf_counter()
            futs = [server.submit(make_request())
                    for _ in range(args.requests)]
            flows = [f.result() for f in futs]
            dt = time.perf_counter() - t0
            assert all(np.isfinite(fl).all() for fl in flows)
            print(f"{label}: {args.requests} requests in {dt:.3f}s = "
                  f"{args.requests / dt:.2f} windows/s "
                  f"({dt / args.requests * 1e3:.2f} ms/request); "
                  f"stats {server.stats()}", flush=True)

        drive(lambda: rng.normal(
            size=(bins, h, w)).astype(np.float32) * 0.3, "voxel@crop")

        if not args.no_events:
            def make_events():
                return {
                    "x": rng.uniform(0, res[1] - 1,
                                     n_events).astype(np.float32),
                    "y": rng.uniform(0, res[0] - 1,
                                     n_events).astype(np.float32),
                    "t": np.sort(rng.uniform(0, 1, n_events)
                                 ).astype(np.float32),
                    "p": rng.integers(0, 2, n_events).astype(np.float32)}
            drive(make_events, f"events@2^{args.events_exp}")


if __name__ == "__main__":
    main()
