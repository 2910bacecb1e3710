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
- request futures, so callers can pipeline as deep as they like;
- optional mesh scaling: with ``mesh=`` the dispatch thread coalesces
  compatible concurrent requests into ONE batch sharded over the mesh's
  data axis — per-window device cost is batch-flat on one chip
  (PERF_NOTES.md batch-scaling measurements), so N chips serve N
  requests in one step's latency.

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
    mesh: a ``jax.sharding.Mesh`` to serve over — params replicated, up to
        ``mesh.shape['data']`` concurrent compatible requests (same kind
        and event bucket) coalesced into one data-sharded batch per step.
    batch_window_s: how long the dispatcher waits for more requests to
        fill a batch once one is in hand (only with ``mesh``).
    s2d: apply the exact space-to-depth embed re-expression
        (training/s2d_embed.py, +13% on the flagship forward on TPU).
        Only valid for the Spikingformer MSPED models with running-stats BN.
    fused_attn: use the fused Pallas spiking-QK window-attention kernel
        (ops/pallas_attn.py, +13% on the flagship forward on TPU; exact
        for the eval protocol — f64-bit-parity-tested). MS family only.
    """

    def __init__(self, config: dict, state=None, *, ckpt: Optional[str] = None,
                 bf16: bool = True, max_pending: int = 8, mesh=None,
                 batch_window_s: float = 0.002, s2d: bool = False,
                 fused_attn: bool = False):
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
        if s2d:
            from .training.s2d_embed import s2d_state
            model, state = s2d_state(model, state)
        if fused_attn:
            # fused Pallas spiking-QK window attention (ops/pallas_attn.py,
            # +13% flagship forward on TPU; exact for the eval protocol) —
            # composes with s2d, mirroring eval_dsec.py --fused_attn
            import dataclasses
            model = model.clone(cfg=model.cfg.replace(fused_qk_attn=True))
            state = dataclasses.replace(state, apply_fn=model.apply)
        self._mesh = mesh
        self._batch = int(mesh.shape["data"]) if mesh is not None else 1
        self._batch_window = float(batch_window_s)
        if mesh is not None:
            from .parallel.mesh import replicate
            state = replicate(state, mesh)
        self._state = state

        kw = dict(encoding=self._encoding, polarity=self._polarity,
                  norm_input=self._norm_input, spike_th=self._spike_th,
                  compute_dtype=jnp.bfloat16 if bf16 else None)
        self._voxel_step = make_eval_step(**kw)
        # events requests are row-grouped on the host while packing
        # (native.pack_window_sorted in _prepare_group), so the Pallas
        # voxelizer skips its on-device lax.sort
        self._events_step = make_eval_step(
            **kw, voxelize=dict(num_bins=self._num_bins,
                                height=self._resolution[0],
                                width=self._resolution[1],
                                presorted=True),
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

    def warmup(self, n_events: Optional[int] = None, *,
               all_buckets: bool = False):
        """Compile the serving step(s) before taking traffic: one voxel-shaped
        request, plus the events bucket for ``n_events``. With
        ``all_buckets`` every bucket from the minimum up to
        ``next_bucket(n_events)`` is compiled (otherwise requests landing
        in a smaller bucket compile on first arrival)."""
        h, w = self._crop or self._resolution
        self.infer(np.zeros((self._num_bins, h, w), np.float32))
        if n_events is not None:
            top = next_bucket(n_events)
            buckets = [top]
            if all_buckets:
                b = next_bucket(0)  # minimum bucket
                while b < top:
                    buckets.insert(-1, b)
                    b *= 2
            for bucket in buckets:
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

    def _put(self, x):
        """Host array -> device; data-axis-sharded batch dim 0 on a mesh."""
        if self._mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(x, NamedSharding(self._mesh, P("data")))

    @staticmethod
    def _batch_key(request):
        """Requests coalesce into one step iff their keys match (same
        compiled program + compatible padding)."""
        if isinstance(request, dict):
            return ("events", next_bucket(len(request["x"])))
        return ("voxel", np.shape(request))

    def _prepare_group(self, requests):
        """Host-side prep + one async device launch for a group of
        compatible requests; returns the device flows [len(requests),...].
        The batch dim is padded to the mesh's data-axis size so the
        compiled program has one static shape."""
        n = len(requests)
        pad = max(self._batch, n)
        if isinstance(requests[0], dict):
            from . import native
            bucket = next_bucket(max(len(r["x"]) for r in requests))
            # one packed H2D transfer instead of 5*n (one DMA launch on
            # real hosts; one round trip through the axon tunnel here),
            # sliced back into the x/y/t/p/valid dict on device. Events are
            # row-grouped while packing (C++ counting sort) so the device
            # step skips its lax.sort; batch-pad rows stay all-zero (a
            # constant key is trivially sorted, weight 0 via valid).
            buf = np.zeros((pad, 5, bucket), np.float32)
            for b, r in enumerate(requests):
                x, y, t, p, valid = native.pack_window_sorted(
                    np.asarray(r["x"]), np.asarray(r["y"]),
                    np.asarray(r["t"]), np.asarray(r["p"]), bucket,
                    height=self._resolution[0], t0=0.0)
                buf[b, 0], buf[b, 1], buf[b, 2], buf[b, 3] = x, y, t, p
                buf[b, 4] = valid
            dev = self._put(buf)
            ev = {"x": dev[:, 0], "y": dev[:, 1], "t": dev[:, 2],
                  "p": dev[:, 3], "valid": dev[:, 4] != 0}
            flows = self._events_step(self._state, ev)
        else:
            first = np.asarray(requests[0], np.float32)
            arr = np.zeros((pad,) + first.shape, np.float32)
            arr[0] = first
            for b, r in enumerate(requests[1:], start=1):
                arr[b] = r
            flows = self._voxel_step(self._state, self._put(arr))
        return flows[-1][:n]  # finest scale, real rows only

    def _collect_group(self, leader):
        """The leader request plus up to batch-1 more compatible requests
        arriving within the batching window. Returns (group, stop) where
        ``stop`` means the close sentinel was seen."""
        group = [leader]
        try:
            key = self._batch_key(leader[1])
        except Exception:  # malformed request: fail it alone in _prepare
            return group, False
        deadline = time.perf_counter() + self._batch_window
        while len(group) < self._batch:
            timeout = deadline - time.perf_counter()
            try:
                nxt = (self._requests.get(timeout=timeout) if timeout > 0
                       else self._requests.get_nowait())
            except queue_mod.Empty:
                break
            if nxt is None:
                return group, True
            try:
                compatible = self._batch_key(nxt[1]) == key
            except Exception as e:  # noqa: BLE001 — delivered via future
                nxt[0].set_exception(e)
                continue
            if not compatible:
                # park it as the next group's leader
                self._carry = nxt
                break
            group.append(nxt)
        return group, False

    def _dispatch_loop(self):
        self._carry = None
        stop = False
        while not stop and not self._closed.is_set():
            item = self._carry if self._carry is not None \
                else self._requests.get()
            self._carry = None
            if item is None:
                break
            if self._batch > 1:
                group, stop = self._collect_group(item)
            else:
                group = [item]
            live = [(f, r, t) for f, r, t in group
                    if f.set_running_or_notify_cancel()]
            if not live:
                continue
            try:
                flows = self._prepare_group([r for _, r, _ in live])
            except Exception as e:  # noqa: BLE001 — delivered via futures
                for f, _, _ in live:
                    f.set_exception(e)
                continue
            self._inflight.put(([f for f, _, _ in live], flows,
                                [t for _, _, t in live]))
        # drain remaining requests on close
        for item in ([self._carry] if self._carry is not None else []):
            item[0].set_exception(RuntimeError("server closed"))
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
            futs, flows_dev, t0s = item
            try:
                flows = np.asarray(jax.device_get(flows_dev), np.float32)
            except Exception as e:  # noqa: BLE001 — delivered via futures
                for fut in futs:
                    fut.set_exception(e)
                continue
            for i, fut in enumerate(futs):
                fut.set_result(flows[i])
            now = time.perf_counter()
            with self._lock:
                self._served += len(futs)
                self._latencies.extend(now - t0 for t0 in t0s)
                if len(self._latencies) > 1024:
                    del self._latencies[:512]
