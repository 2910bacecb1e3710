"""Parameter sharding rules for the (data, model) mesh.

Data parallelism is the reference-parity strategy (SURVEY §2.10: the
reference only has DataParallel). The ``model`` axis adds composable tensor
parallelism: large kernels are sharded over their output-channel axis and
XLA GSPMD propagates activation shardings / inserts the collectives. With
``n_model == 1`` everything degenerates to pure DP.

TP is deliberately SCOPED AWAY from the window-attention interior: the
spiking attention folds batch/space/time through raw reshape chains
(ops/windows.py window_partition_v2_tm — reference-parity quirks), and GSPMD
cannot push a channel-sharded layout through them without "Involuntary full
rematerialization" (replicate + re-partition at every block — observed in
MULTICHIP_r04.json). So:

- parameters under an ``attn`` module scope stay replicated
  (:func:`infer_param_shardings`), and
- the attention segment's input activation is pinned to batch-only sharding
  (:func:`constrain_data_parallel`, called at the attention entry in
  models/spiking_swin.py), so the collective boundary sits at the
  conv/MLP matmuls — where a resharding is a matmul-fused all-gather — and
  the compiled program is clean (asserted by ``__graft_entry__.
  dryrun_multichip``).

Activation constraints use the bare-``PartitionSpec`` form of
``jax.lax.with_sharding_constraint``, which resolves against the mesh
installed by ``jax.set_mesh`` — callers running tensor-parallel must trace
the step under ``with jax.set_mesh(mesh):`` (see dryrun_multichip). Without
an installed mesh (pure DP, single device, tests) the constraint helper is
an exact no-op.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Module scopes whose parameters must stay replicated under TP because the
# activations they touch flow through sharding-hostile reshape chains.
_REPLICATED_SCOPES = ("attn",)


def _path_is_replicated(path) -> bool:
    keys = {str(getattr(k, "key", k)) for k in path}
    return any(scope in keys for scope in _REPLICATED_SCOPES)


def infer_param_shardings(params, mesh: Mesh, min_size: int = 1 << 14):
    """Shard every leaf whose trailing (output-channel) axis divides the
    model-axis size and whose total size exceeds ``min_size``; replicate the
    rest. Parameters inside an ``attn`` scope are always replicated (see
    module docstring). Returns a pytree of NamedSharding."""
    n_model = mesh.shape.get("model", 1)

    def rule(path, leaf):
        if (n_model > 1 and leaf.ndim >= 2 and leaf.size >= min_size
                and leaf.shape[-1] % n_model == 0
                and not _path_is_replicated(path)):
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def constrain_data_parallel(x, batch_axis: int = 1):
    """Pin ``x`` to batch-only sharding (``batch_axis`` -> mesh axis
    ``data``) when tracing under a ``jax.set_mesh`` mesh that has a
    nontrivial ``model`` axis; identity otherwise.

    Placed at the entry of sharding-hostile segments (the spiking window
    attention) so GSPMD gathers channel-sharded activations ONCE at a
    matmul boundary instead of involuntarily rematerializing inside the
    reshape chain.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
        axis_names = tuple(mesh.axis_names)
    except Exception:
        return x
    if "data" not in axis_names or "model" not in axis_names:
        return x
    if mesh.shape.get("model", 1) <= 1:
        return x
    spec = [None] * x.ndim
    spec[batch_axis] = "data"
    return jax.lax.with_sharding_constraint(x, P(*spec))


def shard_params(params, mesh: Mesh, min_size: int = 1 << 14):
    shardings = infer_param_shardings(params, mesh, min_size)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_state(state, mesh: Mesh, min_size: int = 1 << 14):
    """Shard a TrainState: params + matching optimizer moments over
    (model); batch_stats and scalars replicated; opt_state leaves that
    mirror param shapes inherit the param sharding."""
    import dataclasses

    params = shard_params(state.params, mesh, min_size)
    shardings = infer_param_shardings(state.params, mesh, min_size)

    flat_shard = {tuple(str(k) for k in path): s
                  for path, s in jax.tree_util.tree_flatten_with_path(
                      shardings)[0]}

    def opt_rule(path, leaf):
        # optax nests param-shaped moments (mu/nu) under extra prefixes;
        # match trailing path segments against param paths
        key = tuple(str(k) for k in path)
        for pkey, s in flat_shard.items():
            if len(key) >= len(pkey) and key[-len(pkey):] == pkey:
                return jax.device_put(leaf, s)
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    opt_state = jax.tree_util.tree_map_with_path(opt_rule, state.opt_state)
    rest = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())),
        (state.batch_stats, state.step))
    return dataclasses.replace(state, params=params, opt_state=opt_state,
                               batch_stats=rest[0], step=rest[1])
