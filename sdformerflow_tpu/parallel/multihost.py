"""Multi-host (multi-process) training support.

The reference is strictly single-process (torch.nn.DataParallel; an unused
DistributedSampler import at
/root/reference/train_flow_parallel_supervised_SNN.py:23 is its only trace
of DDP intent — SURVEY §2.10). The TPU-native story: one JAX process per
host, a global mesh whose data axis spans all hosts, every process running
the SAME jitted SPMD program, each feeding only its local batch shard —
XLA's collectives ride ICI within a slice and DCN across slices.

What this module adds over parallel.mesh:

- :func:`initialize` — `jax.distributed.initialize` wrapper (env-driven on
  Cloud TPU; explicit coordinator for CPU/Gloo test rigs).
- :func:`make_multihost_mesh` — device mesh with DCN (process) as the
  outermost factor of the data axis so cross-host collectives are the rare
  ones (`create_hybrid_device_mesh` lays ICI-contiguous groups innermost).
- :func:`shard_indices` / :class:`ProcessShardedDataset` — each process
  reads only its contiguous slice of the dataset (the reference's
  DistributedSampler equivalent, done at index level).
- :func:`global_batch` — assemble a globally-sharded array from
  process-local data (`jax.make_array_from_process_local_data`); the
  single-process path degenerates to a plain sharded device_put.
- :func:`process_mean` — cross-process scalar reduction for metrics.

Orbax checkpointing is already multihost-correct as used by
training.checkpoints: saves are collective, and every process takes the
same best-epoch decision because the loss it sees is the global (psum'd)
one.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Join the distributed runtime. On Cloud TPU all arguments come from
    the environment (call with none); on CPU/GPU rigs pass them explicitly.
    No-op if already initialized."""
    # NB: must run before anything touches the XLA backend (jax.devices,
    # jax.process_count, any computation)
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already" not in str(e):
            raise


def make_multihost_mesh(n_model: int = 1) -> Mesh:
    """(data, model) mesh over all global devices. With >1 process the data
    axis factors as (processes × local), built by create_hybrid_device_mesh
    so each host's devices are ICI-contiguous innermost — gradient
    all-reduce segments ride ICI first, one DCN hop last."""
    n_proc = jax.process_count()
    if n_proc == 1:
        from .mesh import make_mesh
        return make_mesh(n_model=n_model)
    from jax.experimental import mesh_utils
    local = jax.local_device_count()
    assert local % n_model == 0, (local, n_model)
    try:
        # multi-slice TPU: group by slice so DCN is the outermost factor
        devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(local // n_model, n_model),
            dcn_mesh_shape=(n_proc, 1))
    except ValueError:
        # single-slice pods / CPU test rigs: no slice_index attribute to
        # group by — order process-major by hand (same layout)
        devs = np.asarray(sorted(jax.devices(),
                                 key=lambda d: (d.process_index, d.id)))
    return Mesh(devs.reshape(n_proc * (local // n_model), n_model),
                ("data", "model"))


def shard_indices(n: int, *, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> range:
    """Contiguous per-process slice of ``range(n)``, truncated so every
    process gets the same count (SPMD programs need equal step counts)."""
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    per = n // pc
    return range(pi * per, (pi + 1) * per)


class ProcessShardedDataset:
    """View of a dataset restricted to this process's index shard.

    Shuffling must happen at the global-index level BEFORE sharding to keep
    epochs statistically equivalent to single-host training; pass
    ``seed`` and reshard per epoch via :meth:`reshard` instead of shuffling
    inside the local shard only.
    """

    def __init__(self, dataset, *, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        self._pi = (jax.process_index() if process_index is None
                    else process_index)
        self._pc = (jax.process_count() if process_count is None
                    else process_count)
        self._perm: Optional[np.ndarray] = None
        self._local = list(shard_indices(len(dataset), process_index=self._pi,
                                         process_count=self._pc))

    @property
    def events_presorted(self):
        # forwarded so _events_voxelize_cfg sees the inner dataset's packer
        # guarantee through the shard view
        return bool(getattr(self.dataset, "events_presorted", False))

    def reshard(self, seed: int):
        """Global shuffle with ``seed`` (same on all processes), then take
        this process's contiguous slice of the permutation."""
        perm = np.random.default_rng(seed).permutation(len(self.dataset))
        per = len(self.dataset) // self._pc
        self._local = perm[self._pi * per:(self._pi + 1) * per].tolist()

    def __len__(self):
        return len(self._local)

    def __getitem__(self, idx):
        return self.dataset[self._local[idx]]


def global_batch(batch, mesh: Mesh):
    """Pytree of process-local [B_local, ...] arrays -> globally-sharded
    arrays [B_global, ...] over the mesh's data axis. Single-process:
    plain sharded device_put (identical semantics)."""
    sh = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def replicate_global(tree, mesh: Mesh):
    """Fully replicate a host-resident pytree over a (possibly multi-host)
    mesh. Every process must hold the same host values (deterministic init
    from a shared seed guarantees this for model/optimizer state)."""
    sh = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x), global_shape=np.shape(x)),
        tree)


def establish_collectives(mesh: Mesh):
    """Run one tiny all-reduce over the mesh NOW, while all processes are
    still in lock-step at startup.

    The first collective over a device clique creates the communicator
    (Gloo TCP pairs on CPU rigs). If that happens lazily inside the first
    big jitted step, processes arrive minutes apart on compile-contended
    hosts and the connect times out. After this warmup the step's
    collectives reuse the established context and simply wait for peers.
    """
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp
    n = mesh.shape["data"]
    local = np.ones(n // jax.process_count(), np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local)
    out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    np.asarray(out)  # block until the collective has run everywhere


def process_mean(value: float) -> float:
    """Mean of a per-process host scalar across processes (metric
    aggregation at epoch boundaries; device metrics inside the jitted step
    are already global through GSPMD)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(
        np.asarray([value], np.float64))
    return float(np.mean(vals))
