"""Eval-time space-to-depth re-expression of the flagship embed head.

Companion of ``cfg.s2d_embed`` (models/spiking_patch_embed.py): rearranges a
trained checkpoint's embed-head weights into 2x2 block space (ops/s2d.py) so
the full-resolution segment

    conv 2->48 (s1) -> BN -> spike -> conv 48->96 (s2) -> BN

runs at ``[T, B, H/2, W/2, C in {8, 192}]`` instead of ``C=48`` at full
resolution — sidestepping the (8,128)-lane padding tax measured in
PERF_NOTES.md (1.29x on the segment on-chip). The transform is EXACT (a
weight rearrangement, not an approximation):

- head conv kernel  [3,3,ci,co]  -> s2d_kernel_s1 -> [3,3,4ci,4co]
- head BN affine / running stats / folded bias: per-channel -> tile by 4
- stride-2 conv kernel [3,3,co,c2] -> s2d_kernel_s2 -> [2,2,4co,c2]
  (its BN / bias acts on the NORMAL-layout output: unchanged)
- spike/PSN params: per-timestep, pixel-relabeling-invariant: unchanged

Usage (mirrors training/bn_folding.py):

    model_s, vars_s = s2d_model_and_variables(model, variables)
    out = model_s.apply(vars_s, x, False)   # == model.apply(variables, x, False)

Inference-only: train-mode BN would compute batch statistics per
block-channel. Composes with BN folding in either order.

Reference equivalent surface: the embed this optimizes is
MS_PED_Spiking_PatchEmbed_Conv_sfn
(/root/reference/models/STSwinNet_SNN/Spiking_modules.py:1710-1837).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from ..ops.s2d import s2d_kernel_s1, s2d_kernel_s2, tile4


def _as_mutable_deep(tree):
    if not isinstance(tree, dict):
        try:
            tree = dict(tree)  # FrozenDict
        except TypeError:
            return tree
    return {k: _as_mutable_deep(v) if hasattr(v, "keys") else v
            for k, v in tree.items()}


def _find_patch_embed(tree: Dict[str, Any]) -> Optional[Tuple[Dict[str, Any], ...]]:
    """Locate the (unique) patch_embed subtree with a head conv."""
    if not isinstance(tree, dict):
        return None
    pe = tree.get("patch_embed")
    if (isinstance(pe, dict) and isinstance(pe.get("head"), dict)
            and isinstance(pe.get("conv"), dict)):
        return (pe,)
    for v in tree.values():
        if isinstance(v, dict):
            found = _find_patch_embed(v)
            if found:
                return found
    return None


def _tile_channel_leaves(tree: Dict[str, Any], channels: int) -> None:
    """tile4 every 1-D length-``channels`` leaf (BN scale/bias/mean/var)."""
    for k, v in tree.items():
        if isinstance(v, dict):
            _tile_channel_leaves(v, channels)
        elif getattr(v, "shape", None) == (channels,):
            tree[k] = tile4(v)


def s2d_embed_variables(variables) -> Dict[str, Any]:
    """Rearrange the embed-head leaves of ``variables`` into block space.

    Returns a new variables dict for the same model with
    ``cfg.s2d_embed=True``. Works on raw or BN-folded variables (the folded
    head bias is tiled like the BN affine it came from).
    """
    params = _as_mutable_deep(variables["params"])
    stats = _as_mutable_deep(variables.get("batch_stats", {}))

    found_p = _find_patch_embed(params)
    if not found_p:
        raise ValueError("no patch_embed/{head,conv} subtree in params — "
                         "s2d_embed only applies to the MSPED conv-sfn embed")
    pe_p = found_p[0]
    found_s = _find_patch_embed(stats)
    pe_s = found_s[0] if found_s else {}

    head_conv = pe_p["head"]["conv"]
    w1 = head_conv["kernel"]
    if w1.ndim != 4 or w1.shape[:2] != (3, 3):
        raise ValueError(f"head conv kernel must be 3x3, got {w1.shape}")
    co = w1.shape[3]
    head_conv["kernel"] = s2d_kernel_s1(w1)
    if "bias" in head_conv:
        head_conv["bias"] = tile4(head_conv["bias"])
    if isinstance(pe_p["head"].get("norm"), dict):
        _tile_channel_leaves(pe_p["head"]["norm"], co)
    if isinstance(pe_s.get("head", {}).get("norm"), dict):
        _tile_channel_leaves(pe_s["head"]["norm"], co)

    exit_conv = pe_p["conv"]["conv"]
    w2 = exit_conv["kernel"]
    if w2.shape[:3] != (3, 3, co):
        raise ValueError(f"stride-2 conv kernel must be [3,3,{co},*], got "
                         f"{w2.shape}")
    exit_conv["kernel"] = s2d_kernel_s2(w2)
    # exit bias / conv norm act on the normal-layout output: unchanged

    out = {"params": params}
    if stats or "batch_stats" in variables:
        out["batch_stats"] = stats
    for k, v in variables.items():
        if k not in ("params", "batch_stats"):
            out[k] = v
    return out


def s2d_model_and_variables(model, variables):
    """Convenience: (model with cfg.s2d_embed=True, rearranged variables)."""
    s2d_model = model.clone(cfg=model.cfg.replace(s2d_embed=True))
    return s2d_model, s2d_embed_variables(variables)


def s2d_state(model, state):
    """TrainState convenience for the inference drivers: rearranged
    params/batch_stats and the s2d model's apply_fn (opt_state untouched —
    inference-only states; the transform invalidates it for training)."""
    import dataclasses
    model_s, vs = s2d_model_and_variables(
        model, {"params": state.params, "batch_stats": state.batch_stats})
    return model_s, dataclasses.replace(
        state, params=vs["params"], batch_stats=vs.get("batch_stats", {}),
        apply_fn=model_s.apply)
