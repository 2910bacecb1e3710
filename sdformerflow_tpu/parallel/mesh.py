"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(replicate module, scatter batch over NCCL copies — see SURVEY §2.10). The
TPU-native equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis, batches
sharded along it, parameters replicated; XLA inserts the gradient all-reduce
over ICI automatically from the sharding specs.

A ``model`` axis is reserved in the mesh so tensor-sharded layouts compose
later without re-plumbing (the reference model, tens of M params, doesn't
need TP).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis-0 sharding along the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of [B, ...] arrays sharded along data."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def host_prefetch(iterator, size: int = 2):
    """Run the host-side batch producer (dataset indexing, event packing,
    numpy collation, augmentation RNG) in a background thread with a
    bounded queue so it overlaps device compute.

    The reference gets this from torch DataLoader worker processes
    (``num_workers``, /root/reference/train_flow_parallel_supervised_SNN.py
    loader construction); on the 1-CPU TPU host a single background thread
    is the right amount of parallelism — the producer is IO/numpy-bound
    and releases the GIL in the C++ pack kernels and numpy ops.

    Producer exceptions re-raise in the consumer; closing the generator
    (early ``break``) stops the thread promptly via a stop flag.
    """
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=size)
    stop = threading.Event()
    end = object()
    errs = []

    def worker():
        try:
            for item in iterator:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue_mod.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            errs.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(end, timeout=0.1)
                    break
                except queue_mod.Full:
                    continue

    thread = threading.Thread(target=worker, daemon=True,
                              name="host-prefetch")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is end:
                if errs:
                    raise errs[0]
                return
            yield item
    finally:
        stop.set()


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2,
                       host_threads: bool = True, put=None):
    """Double-buffered host->device transfer: keep ``size`` batches in
    flight so the H2D copy of batch k+1 overlaps the compute of batch k
    (device_put is asynchronous). With ``host_threads`` the host-side
    producer additionally runs in a background thread (host_prefetch), so
    dataset work overlaps device compute instead of running between
    steps. ``put`` overrides the batch->device function (multi-host
    training passes parallel.multihost.global_batch)."""
    import collections
    import jax.numpy as jnp

    if put is None:
        put = lambda b: shard_batch(  # noqa: E731
            jax.tree_util.tree_map(jnp.asarray, b), mesh)
    if host_threads:
        iterator = host_prefetch(iterator, size=size)
    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) == size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
