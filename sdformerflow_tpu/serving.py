"""Persistent-process inference serving for event-camera optical flow.

The reference has no serving story — inference happens inside the eval
scripts (one Python process per evaluation pass,
/root/reference/eval_DSEC_flow_SNN.py). For production deployment the unit
of work is one event window -> one flow map (35.3 ms/window at the full
DSEC eval protocol with the on-device Pallas voxelizer, PERF_NOTES.md
"Full-scale events-path eval step"), and throughput comes from keeping the
chip busy across requests: dispatch of request k+1 must overlap the
device->host fetch of request k.

:class:`FlowServer` is that engine:

- one jitted eval step, compiled per input bucket (event counts are padded
  to power-of-two buckets so the number of distinct HLO shapes is bounded);
- a dispatch thread that pads/uploads/launches (JAX dispatch is
  asynchronous, so launches run ahead of device completion);
- a fetch thread that blocks on device results and resolves futures —
  the only thread that ever waits on the device;
- request futures, so callers can pipeline as deep as they like.

``scripts/serve.py`` wraps this in an HTTP endpoint.
"""

from __future__ import annotations

import queue as queue_mod
import threading
import time
from concurrent.futures import Future
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def next_bucket(n: int, minimum: int = 4096) -> int:
    """Smallest power-of-two >= n (>= minimum) — the padded event-buffer
    length, bounding distinct compiled shapes to ~log2(max_events)."""
    return max(minimum, 1 << max(int(n) - 1, 1).bit_length())


class FlowServer:
    """Persistent inference engine over one model checkpoint.

    Parameters
    ----------
    config: merged train(+eval) config dict (training.config.load_config).
    state: a TrainState (already restored); or pass ``ckpt`` to restore.
    bf16: run the bf16 inference path (default True — the deployment path).
    max_pending: bound on in-flight requests before ``submit`` blocks.
    """

    def __init__(self, config: dict, state=None, *, ckpt: Optional[str] = None,
                 bf16: bool = True, max_pending: int = 8):
        from .models import get_model
        from .ops.normalization import encode_input
        from .training.config import build_configs
        from .training.optim import build_optimizer
        from .training.train_step import create_train_state, make_eval_step

        self.config = config
        model_cfg, swin_cfg, spiking_cfg = build_configs(config)
        name = config["model"]["name"]
        model = get_model(name, model_cfg, swin_cfg, spiking_cfg)
        is_snn = "Spiking" in name

        self._encoding = config["model"].get("encoding", "voxel")
        self._polarity = config["loader"].get("polarity", True) and is_snn
        self._norm_input = config["model"].get("norm_input")
        self._spike_th = config["data"].get("spike_th")
        self._num_bins = config["data"].get("num_frames", 10)
        res = config["loader"].get("resolution", (480, 640))
        self._resolution = tuple(res)
        crop = config["loader"].get("crop")
        self._crop = tuple(crop) if crop else None

        h, w = self._crop or self._resolution
        if state is None:
            sample = jnp.zeros((1, self._num_bins, h, w), jnp.float32)
            sample_enc = encode_input(
                sample, encoding=self._encoding, polarity=self._polarity,
                norm_input=self._norm_input, spike_th=self._spike_th)
            tx = build_optimizer(lr=1e-4, steps_per_epoch=1)
            state = create_train_state(model, tx, sample_enc,
                                       jax.random.PRNGKey(0))
            if ckpt is not None:
                from .training.checkpoints import restore_checkpoint
                state, _ = restore_checkpoint(ckpt, state)
        self._state = state

        kw = dict(encoding=self._encoding, polarity=self._polarity,
                  norm_input=self._norm_input, spike_th=self._spike_th,
                  compute_dtype=jnp.bfloat16 if bf16 else None)
        self._voxel_step = make_eval_step(**kw)
        self._events_step = make_eval_step(
            **kw, voxelize=dict(num_bins=self._num_bins,
                                height=self._resolution[0],
                                width=self._resolution[1]),
            crop=self._crop)

        self._requests: "queue_mod.Queue" = queue_mod.Queue(
            maxsize=max_pending)
        self._inflight: "queue_mod.Queue" = queue_mod.Queue(
            maxsize=max_pending)
        self._closed = threading.Event()
        self._lock = threading.Lock()
        self._served = 0
        self._latencies: list = []

        self._dispatcher = threading.Thread(
            target=self._dispatch_loop, daemon=True, name="flow-dispatch")
        self._fetcher = threading.Thread(
            target=self._fetch_loop, daemon=True, name="flow-fetch")
        self._dispatcher.start()
        self._fetcher.start()

    # ---------------------------------------------------------------- API

    def submit(self, request) -> Future:
        """Enqueue one window; returns a Future resolving to the flow map
        [2, H, W] float32.

        ``request`` is either a voxel chunk ([bins, H, W] or
        [bins, 2, H, W] numpy array, already at crop size) or a dict with
        keys x/y/t/p ([N] arrays of raw events at sensor resolution —
        voxelized and center-cropped on device).
        """
        if self._closed.is_set():
            raise RuntimeError("server closed")
        fut: Future = Future()
        self._requests.put((fut, request, time.perf_counter()))
        return fut

    def infer(self, request):
        """Synchronous single-request helper."""
        return self.submit(request).result()

    def warmup(self, n_events: Optional[int] = None):
        """Compile the serving step(s) before taking traffic: one voxel-shaped
        request, plus one events request per bucket up to ``n_events``."""
        h, w = self._crop or self._resolution
        self.infer(np.zeros((self._num_bins, h, w), np.float32))
        if n_events is not None:
            bucket = next_bucket(n_events)
            ev = {"x": np.zeros(bucket, np.float32),
                  "y": np.zeros(bucket, np.float32),
                  "t": np.linspace(0, 1, bucket, dtype=np.float32),
                  "p": np.ones(bucket, np.float32)}
            self.infer(ev)

    def stats(self) -> dict:
        with self._lock:
            lat = list(self._latencies)
            served = self._served
        out = {"served": served, "pending": self._requests.qsize()
               + self._inflight.qsize()}
        if lat:
            out["latency_ms_p50"] = float(np.percentile(lat, 50) * 1e3)
            out["latency_ms_p95"] = float(np.percentile(lat, 95) * 1e3)
        return out

    def close(self):
        self._closed.set()
        # unblock the workers
        try:
            self._requests.put_nowait(None)
        except queue_mod.Full:
            pass
        self._dispatcher.join(timeout=5)
        try:
            self._inflight.put_nowait(None)
        except queue_mod.Full:
            pass
        self._fetcher.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------ workers

    def _prepare(self, request):
        """Host-side prep + async device launch; returns the device flow."""
        if isinstance(request, dict):
            n = len(request["x"])
            bucket = next_bucket(n)
            if n > bucket:
                raise ValueError(f"{n} events exceed buffer {bucket}")
            # one packed H2D transfer instead of five (one DMA launch on
            # real hosts; one round trip through the axon tunnel here),
            # sliced back into the x/y/t/p/valid dict on device
            buf = np.zeros((5, bucket), np.float32)
            for i, k in enumerate(("x", "y", "t", "p")):
                buf[i, :n] = request[k]
            buf[4, :n] = 1.0
            dev = jnp.asarray(buf)
            ev = {"x": dev[0][None], "y": dev[1][None], "t": dev[2][None],
                  "p": dev[3][None], "valid": (dev[4] != 0)[None]}
            flows = self._events_step(self._state, ev)
        else:
            chunk = jnp.asarray(np.asarray(request, np.float32)[None])
            flows = self._voxel_step(self._state, chunk)
        return flows[-1][0]  # finest scale, batch 0

    def _dispatch_loop(self):
        while not self._closed.is_set():
            item = self._requests.get()
            if item is None:
                break
            fut, request, t0 = item
            if not fut.set_running_or_notify_cancel():
                continue
            try:
                flow_dev = self._prepare(request)
            except Exception as e:  # noqa: BLE001 — delivered via future
                fut.set_exception(e)
                continue
            self._inflight.put((fut, flow_dev, t0))
        # drain remaining requests on close
        while True:
            try:
                item = self._requests.get_nowait()
            except queue_mod.Empty:
                break
            if item is not None:
                item[0].set_exception(RuntimeError("server closed"))

    def _fetch_loop(self):
        while True:
            item = self._inflight.get()
            if item is None:
                break
            fut, flow_dev, t0 = item
            try:
                flow = np.asarray(jax.device_get(flow_dev), np.float32)
            except Exception as e:  # noqa: BLE001 — delivered via future
                fut.set_exception(e)
                continue
            fut.set_result(flow)
            with self._lock:
                self._served += 1
                self._latencies.append(time.perf_counter() - t0)
                if len(self._latencies) > 1024:
                    del self._latencies[:512]
