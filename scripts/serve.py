#!/usr/bin/env python
"""HTTP inference server for event-camera optical flow.

A persistent-process serving surface the reference lacks (its inference
lives inside one-shot eval scripts, /root/reference/eval_DSEC_flow_SNN.py).
The engine is sdformerflow_tpu.serving.FlowServer: jitted bf16 eval step,
dispatch/fetch threads pipelining H2D/compute/D2H across requests, raw
events voxelized on device (Pallas on TPU).

    python scripts/serve.py --train_config configs/train_dsec_sdformerflow_en4.yaml \
        --ckpt runs/en4/ckpt --port 8787 [--warmup_events 1048576]

Protocol (numpy .npz bodies):
  POST /flow   body npz with either ``chunk`` ([bins, H, W] voxels at crop
               size) or ``x,y,t,p`` ([N] raw events at sensor resolution)
               -> npz response with ``flow`` ([2, H, W] float32)
  GET  /stats  -> JSON {served, pending, latency_ms_p50, latency_ms_p95}
  GET  /healthz -> 200 "ok"
"""

import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def build_handler(server):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/stats":
                self._send(200, json.dumps(server.stats()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/flow":
                self._send(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            data = np.load(io.BytesIO(self.rfile.read(n)))
            try:
                if "chunk" in data:
                    request = data["chunk"]
                else:
                    request = {k: data[k] for k in ("x", "y", "t", "p")}
                flow = server.infer(request)
            except Exception as e:  # noqa: BLE001 — surfaced to the client
                self._send(400, str(e).encode(), "text/plain")
                return
            buf = io.BytesIO()
            np.savez_compressed(buf, flow=flow)
            self._send(200, buf.getvalue())

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_config", required=True)
    ap.add_argument("--eval_config", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--warmup_events", type=int, default=None,
                    help="compile the events bucket for this many events "
                         "at startup")
    ap.add_argument("--warmup_all_buckets", action="store_true",
                    help="also compile every smaller event bucket so no "
                         "request ever hits first-arrival compile latency")
    ap.add_argument("--dp", type=int, default=1,
                    help="serve over a data-parallel mesh of this many "
                         "devices: concurrent compatible requests coalesce "
                         "into one sharded batch (N devices -> ~N x "
                         "throughput; per-window cost is batch-flat)")
    ap.add_argument("--s2d", action="store_true",
                    help="exact space-to-depth embed re-expression (+13%% "
                         "TPU forward; Spikingformer MSPED models with "
                         "running-stats BN only)")
    ap.add_argument("--fused_attn", action="store_true",
                    help="fused Pallas spiking-QK window-attention kernel "
                         "(+13%% TPU forward; MS family; exact for the "
                         "eval protocol)")
    args = ap.parse_args()

    from sdformerflow_tpu.serving import FlowServer
    from sdformerflow_tpu.training.config import (load_config,
                                                  merge_eval_config)
    from sdformerflow_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = load_config(args.train_config)
    if args.eval_config:
        config = merge_eval_config(config, load_config(args.eval_config))

    mesh = None
    if args.dp > 1:
        from sdformerflow_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_data=args.dp)
    server = FlowServer(config, ckpt=args.ckpt, bf16=not args.no_bf16,
                        mesh=mesh, s2d=args.s2d,
                        fused_attn=args.fused_attn)
    print("warming up (compiling serving step)...", flush=True)
    server.warmup(args.warmup_events,
                  all_buckets=args.warmup_all_buckets)
    httpd = ThreadingHTTPServer((args.host, args.port),
                                build_handler(server))
    print(f"serving on http://{args.host}:{args.port}", flush=True)
    # graceful stop on SIGTERM (what orchestrators send): finish in-flight
    # requests, then fall through to server.close(). shutdown() blocks
    # until serve_forever returns, so call it from a helper thread.
    import signal
    import threading
    signal.signal(signal.SIGTERM, lambda s, f: threading.Thread(
        target=httpd.shutdown, daemon=True).start())
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
