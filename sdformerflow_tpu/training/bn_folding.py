"""Eval-time BatchNorm folding: bake the BN affine into adjacent weights.

At inference every running-stats BatchNorm is a constant per-channel affine
``y = a*x + b`` with ``a = scale / sqrt(var + eps)`` and
``b = bias - mean * a``. Because every foldable BN in this model zoo
directly FOLLOWS a conv / linear (SEW: conv->BN->spike; MS: spike->conv->BN),
the affine folds exactly into that layer's kernel (scaled along the output
axis) and bias — deleting the whole BN elementwise pass and its f32
round-trip at every neuron site (the dominant non-matmul traffic in the
round-2 profile, PERF_NOTES.md).

Usage:
    model_f, vars_f = fold_model_and_variables(model, variables)
    out = model_f.apply(vars_f, x, False)   # == model.apply(variables, x, False)

The folded model is the same module with ``cfg.fold_bn=True`` — each layer
then skips its norm module and enables the partner bias
(models/spiking_layers.py:norm_is_folded). Folding is inference-only: train
mode would need the batch statistics the fold removed.

Reference equivalent surface: the reference runs eval with BN in eval mode
(running stats), e.g. eval_DSEC_flow_SNN.py:199-217 — numerically identical
to the folded form.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

# norm-key -> partner-layer-key candidates, in lookup order. Derived from the
# fixed module layouts in models/spiking_layers.py / models/spiking_swin.py:
# every foldable BN's producer lives in the same parent scope under one of
# these names.
_PARTNERS = {
    "norm": ("conv", "deconv", "reduction"),
    "norm1": ("conv1", "pwconv1", "deconv1"),
    "norm2": ("conv2", "pwconv2", "deconv2"),
    "bn": ("linear",),
    "bn1": ("fc1",),
    "bn2": ("fc2",),
    "proj_bn": ("proj",),
}

_BN_EPS = 1e-5  # TorchBatchNorm default; BNTT (eps 1e-4) is never folded


def _as_mutable(tree):
    try:  # FrozenDict -> plain dict (flax >= 0.6 returns plain dicts)
        import flax
        return flax.core.unfreeze(tree)
    except Exception:
        return dict(tree)


def _find_bn(p_norm: Dict[str, Any], s_norm: Optional[Dict[str, Any]]
             ) -> Optional[Tuple[Dict[str, Any], Dict[str, Any]]]:
    """Return (bn_params, bn_stats) if this norm subtree is a foldable
    running-stats BN (TorchBatchNorm directly, or wrapped in SpikingNorm as
    child 'BatchNorm_0'); None for GN/LN/BN_notrack/BNTT."""
    if s_norm is None:
        return None
    if "scale" in p_norm and "mean" in s_norm and "var" in s_norm:
        return p_norm, s_norm
    child_p = p_norm.get("BatchNorm_0")
    child_s = s_norm.get("BatchNorm_0")
    if (isinstance(child_p, dict) and isinstance(child_s, dict)
            and "scale" in child_p and "mean" in child_s):
        return child_p, child_s
    return None


def _fold_into(partner: Dict[str, Any], bn_p, bn_s) -> Dict[str, Any]:
    a = bn_p["scale"] / jnp.sqrt(bn_s["var"] + _BN_EPS)
    b = bn_p["bias"] - bn_s["mean"] * a
    out = dict(partner)
    # all partner kernels are output-channel-last: nn.Conv (HWIO), nn.Dense
    # (in, out), TorchConvTranspose (kh, kw, in, out)
    out["kernel"] = partner["kernel"] * a
    if "bias" in partner:
        out["bias"] = partner["bias"] * a + b
    else:
        out["bias"] = b
    return out


def _walk(params: Dict[str, Any], stats: Optional[Dict[str, Any]]) -> None:
    for key in list(params.keys()):
        sub = params[key]
        if not isinstance(sub, dict):
            continue
        if key in _PARTNERS:
            s_sub = stats.get(key) if isinstance(stats, dict) else None
            found = _find_bn(sub, s_sub)
            if found is not None:
                bn_p, bn_s = found
                for cand in _PARTNERS[key]:
                    if cand in params and "kernel" in params[cand]:
                        params[cand] = _fold_into(params[cand], bn_p, bn_s)
                        del params[key]
                        if isinstance(stats, dict) and key in stats:
                            del stats[key]
                        break
                else:
                    raise ValueError(
                        f"foldable BN {key!r} has no partner layer among "
                        f"{_PARTNERS[key]} (siblings: {sorted(params)})")
                continue
        _walk(sub, stats.get(key) if isinstance(stats, dict) else None)


def _prune_empty(tree):
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        v = _prune_empty(v)
        if not (isinstance(v, dict) and not v):
            out[k] = v
    return out


def fold_bn_variables(variables) -> Dict[str, Any]:
    """Fold every running-stats BN in ``variables`` into its partner layer.

    Returns a new variables dict for a model built with ``cfg.fold_bn=True``:
    folded norm params / batch_stats are removed, partner layers gain the
    folded kernel + bias. Non-foldable norms (GN/LN/BN_notrack/BNTT) are left
    untouched (their modules stay in the folded model too).
    """
    params = _as_mutable(variables["params"])
    stats = _as_mutable(variables.get("batch_stats", {}))

    def deep(tree):
        return {k: deep(v) if isinstance(v, dict) else v
                for k, v in tree.items()}

    params, stats = deep(params), deep(stats)
    _walk(params, stats)
    out = {"params": params, "batch_stats": _prune_empty(stats)}
    for k, v in variables.items():
        if k not in ("params", "batch_stats"):
            out[k] = v
    return out


def fold_model_and_variables(model, variables):
    """Convenience: (model with cfg.fold_bn=True, folded variables)."""
    folded_model = model.clone(cfg=model.cfg.replace(fold_bn=True))
    return folded_model, fold_bn_variables(variables)
