"""Data-dependent input normalization and binarization, jit-safe.

The reference performs these with boolean indexing inside the train loop
(/root/reference/train_flow_parallel_supervised_SNN.py:258-297); here they are
masked reductions so they trace under jit with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def polarity_split(chunk):
    """[B, bins, H, W] signed voxels -> [B, bins, 2, H, W] with
    (relu(x), relu(-x)) polarity channels.

    Parity: train_flow_parallel_supervised_SNN.py:258-265.
    """
    pos = jnp.maximum(chunk, 0.0)
    neg = jnp.maximum(-chunk, 0.0)
    return jnp.stack((pos, neg), axis=2)


def normalize_nonzero_minmax(x):
    """Min-max normalize over nonzero entries only (zeros stay zero).

    Parity: train_..._SNN.py:278-284 (norm_input == 'minmax').
    """
    mask = x != 0
    big = jnp.finfo(x.dtype).max
    mn = jnp.min(jnp.where(mask, x, big))
    mx = jnp.max(jnp.where(mask, x, -big))
    any_nonzero = mask.any()
    scale = mx - mn
    ok = any_nonzero & (scale != 0)
    normed = jnp.where(mask, (x - mn) / jnp.where(ok, scale, 1.0), x)
    return jnp.where(ok, normed, x)


def normalize_nonzero_std(x):
    """Standardize over nonzero entries only (zeros stay zero).

    Parity: train_..._SNN.py:285-291 (norm_input == 'std'). torch's
    ``.std()`` is the UNBIASED estimator (n-1 denominator) — caught by
    tests/test_eval_loop_parity.py; the biased form is ~0.1% off at typical
    footprints. Degenerate counts match torch's guard: n==1 gives std=nan
    and n==0 std=-0.0, neither passes ``std > 0``, so x is returned
    unnormalized either way.
    """
    mask = x != 0
    count = mask.sum()
    mean = jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(count, 1)
    var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0)) / (count - 1)
    std = jnp.sqrt(var)
    normed = jnp.where(mask, (x - mean) / jnp.where(std > 0, std, 1.0), x)
    return jnp.where(std > 0, normed, x)


def spike_binarize(x, threshold):
    """Values above threshold -> 1, below -> 0; values exactly equal to the
    threshold pass through unchanged (a reference quirk kept for parity:
    train_..._SNN.py:295-297).
    """
    x = jnp.where(x > threshold, 1.0, x)
    x = jnp.where(x < threshold, 0.0, x)
    return x


def encode_input(chunk, *, encoding="voxel", polarity=True, norm_input="minmax",
                 spike_th=None):
    """Full reference input-encoding pipeline for the SNN drivers:
    polarity split -> nonzero normalize -> optional spike binarize.

    ``chunk``: [B, bins, H, W] signed voxels (polarity=True) or
    [B, bins, 2, H, W] per-polarity counts.
    Returns [B, bins, 2, H, W].
    """
    if encoding not in ("voxel", "cnt"):
        raise ValueError(f"unsupported encoding {encoding!r}")
    if encoding == "voxel" and polarity:
        chunk = polarity_split(chunk)
    if norm_input == "minmax":
        chunk = normalize_nonzero_minmax(chunk)
    elif norm_input == "std":
        chunk = normalize_nonzero_std(chunk)
    if spike_th is not None:
        chunk = spike_binarize(chunk, spike_th)
    return chunk
