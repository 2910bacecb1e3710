"""Per-weight gradient statistics probe.

Parity target: /root/reference/utils/gradients.py:4-15 (per-parameter
abs-grad mean/min/max dict, stored to CSV when vis.store_grads is set).
"""

from __future__ import annotations

import csv
from typing import Dict, List

import jax
import jax.numpy as jnp


def get_grads(grads) -> Dict[str, tuple]:
    """pytree of grads -> {param_path: (mean|g|, min|g|, max|g|)}."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for path, g in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        a = jnp.abs(g)
        out[name] = (float(a.mean()), float(a.min()), float(a.max()))
    return out


def save_grads_csv(records: List[Dict[str, tuple]], path: str):
    """List of per-step grad dicts -> CSV (one row per step)."""
    if not records:
        return
    keys = sorted(records[0].keys())
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["step"] + [f"{k}:{s}" for k in keys
                                    for s in ("mean", "min", "max")])
        for i, rec in enumerate(records):
            row = [i]
            for k in keys:
                row.extend(rec.get(k, (float("nan"),) * 3))
            writer.writerow(row)
