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


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2):
    """Double-buffered host->device transfer: keep ``size`` batches in
    flight so the H2D copy of batch k+1 overlaps the compute of batch k
    (device_put is asynchronous)."""
    import collections
    import jax.numpy as jnp

    queue = collections.deque()
    for batch in iterator:
        queue.append(shard_batch(
            jax.tree_util.tree_map(jnp.asarray, batch), mesh))
        if len(queue) == size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
