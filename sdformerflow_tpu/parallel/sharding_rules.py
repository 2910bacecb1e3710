"""Parameter sharding rules for the (data, model) mesh.

Data parallelism is the reference-parity strategy (SURVEY §2.10: the
reference only has DataParallel). The ``model`` axis adds composable tensor
parallelism: large kernels are sharded over their output-channel axis and
XLA GSPMD propagates activation shardings / inserts the collectives. With
``n_model == 1`` everything degenerates to pure DP.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def infer_param_shardings(params, mesh: Mesh, min_size: int = 1 << 14):
    """Shard every leaf whose trailing (output-channel) axis divides the
    model-axis size and whose total size exceeds ``min_size``; replicate the
    rest. Returns a pytree of NamedSharding."""
    n_model = mesh.shape.get("model", 1)

    def rule(leaf):
        if (n_model > 1 and leaf.ndim >= 2 and leaf.size >= min_size
                and leaf.shape[-1] % n_model == 0):
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


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
