"""Supervised flow loss and evaluation metrics.

Parity targets: /root/reference/loss/flow_supervised.py
- flow_loss_supervised.forward (:81-105): mean over the multi-res prediction
  list of the masked AEE, then mean over batch. With gamma set, the RAFT-style
  sequence loss (:56-80) is used instead.
- AEE metric (:108-149): per-batch masked AEE + PE1/PE2/PE3 + DSEC outlier%.
- AAE metric (:152-175): masked mean angular error in degrees.

All functions are pure and jit-friendly. Flow tensors are ``[B, 2, H, W]``,
masks ``[B, 1, H, W]`` (or ``[B, H, W]``).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

MAX_FLOW = 400.0


def _flatten_mask(mask, batch):
    return mask.reshape(batch, -1)


def masked_epe(flow, gt_flow, mask, num_valid_px):
    """Per-sample masked average endpoint error; ``num_valid_px`` is the
    TOTAL valid count over the whole batch (reference quirk: the per-sample
    sum is divided by the global count, then averaged over batch)."""
    b = flow.shape[0]
    error = jnp.sqrt(((flow - gt_flow) ** 2).sum(axis=1) + 1e-8)
    error = error.reshape(b, -1) * _flatten_mask(mask, b)
    return error.sum(axis=1) / (num_valid_px + 1e-9)


def angular_loss(flow, gt_flow, mask, num_valid_px, epsilon=1e-8):
    """Masked mean angular error in radians (reference
    angular_loss_function, flow_supervised.py:32-39; unused by the training
    configs but part of the loss API)."""
    flow_mag = jnp.sqrt((flow ** 2).sum(axis=1) + epsilon)
    gt_mag = jnp.sqrt((gt_flow ** 2).sum(axis=1) + epsilon)
    dot = flow[:, 0] * gt_flow[:, 0] + flow[:, 1] * gt_flow[:, 1]
    cos = (dot + epsilon) / (flow_mag * gt_mag + epsilon)
    cos = jnp.clip(cos, -1.0 + epsilon, 1.0 - epsilon)
    mask = mask.squeeze(1) if mask.ndim == 4 else mask
    return (jnp.arccos(cos) * mask).sum() / (num_valid_px + 1e-9)


def relative_loss(flow, gt_flow, mask, num_valid_px, epsilon=1e-7):
    """EPE normalized by GT magnitude (rel_loss_function, :41-45)."""
    error = jnp.sqrt(((flow - gt_flow) ** 2).sum(axis=1))
    gt_mag = jnp.sqrt((gt_flow ** 2).sum(axis=1))
    mask = mask.squeeze(1) if mask.ndim == 4 else mask
    return ((error * mask) / (gt_mag + epsilon)).sum() / (num_valid_px + 1e-9)


def cosine_loss(flow, gt_flow, mask, num_valid_px, epsilon=1e-7):
    """1 - cosine similarity of flow directions (cosine_loss_function,
    :47-54)."""
    flow_mag = jnp.sqrt((flow ** 2).sum(axis=1))
    gt_mag = jnp.sqrt((gt_flow ** 2).sum(axis=1))
    dot = flow[:, 0] * gt_flow[:, 0] + flow[:, 1] * gt_flow[:, 1]
    cos = (dot + epsilon) / (flow_mag * gt_mag + epsilon)
    cos = jnp.clip(cos, -1.0 + epsilon, 1.0 - epsilon)
    mask = mask.squeeze(1) if mask.ndim == 4 else mask
    return ((1.0 - cos) * mask).sum() / (num_valid_px + 1e-9)


def sequence_loss(pred_list, gt_flow, valid, gamma=0.8, max_flow=MAX_FLOW):
    """RAFT-style gamma-weighted L1 sequence loss with magnitude validity.

    Matches the reference exactly at batch 1
    (/root/reference/loss/flow_supervised.py:56-80,
    tests/test_losses.py A/B). Deliberate deviation for batch > 1: the
    reference ANDs ``valid [B,1,H,W]`` with ``mag [B,H,W]`` — a broadcast
    to ``[B,B,H,W]`` that crashes for B > 2 and cross-pairs samples at
    B == 2; here the mask stays per-sample ``[B,H,W]``. No shipped config
    uses gamma (all set ``gamma: Null``), so no trained behavior depends
    on the broken branch.
    """
    n = len(pred_list)
    mag = jnp.sqrt((gt_flow ** 2).sum(axis=1))
    valid = (valid.squeeze(1) >= 0.5) & (mag < max_flow)
    loss = 0.0
    for i, pred in enumerate(pred_list):
        w = gamma ** (n - i - 1)
        loss = loss + w * (valid[:, None] * jnp.abs(pred - gt_flow)).mean()
    return loss


def flow_loss_supervised(pred_list: Sequence, gt_flow, mask, *,
                         flow_scaling=1.0, lambda_mod=1.0, gamma=None):
    """Multi-res supervised flow loss (the training objective)."""
    if gamma is not None:
        return sequence_loss(pred_list, gt_flow, mask, gamma)
    num_valid_px = mask.sum()
    loss = 0.0
    for pred in pred_list:
        loss = loss + lambda_mod * masked_epe(pred * flow_scaling, gt_flow,
                                              mask, num_valid_px)
    return (loss / len(pred_list)).mean()


def aee_metrics(pred, gt_flow, mask, flow_scaling=1.0):
    """Returns dict(AEE, PE1, PE2, PE3, outlier) matching the reference AEE
    module, including its conventions: AEE is per-sample then un-meaned
    (we mean over batch), PE*/outlier are summed over the whole batch and
    divided by the per-sample valid count vector (broadcast), matching
    loss/flow_supervised.py:137-147."""
    b = pred.shape[0]
    flow = pred * flow_scaling
    flow_mag = jnp.sqrt((flow ** 2).sum(axis=1)).reshape(b, -1)
    error = jnp.sqrt(((flow - gt_flow) ** 2).sum(axis=1)).reshape(b, -1)
    m = _flatten_mask(mask, b)
    error = error * m
    flow_mag = flow_mag * m
    num_valid = m.sum(axis=1)
    aee = error.sum(axis=1) / (num_valid + 1e-9)

    outliers = (error > 3.0) & (error > 0.05 * flow_mag)
    pe1 = (error > 1.0).sum() / (num_valid + 1e-9)
    pe2 = (error > 2.0).sum() / (num_valid + 1e-9)
    pe3 = (error > 3.0).sum() / (num_valid + 1e-9)
    pct = outliers.sum() / (num_valid + 1e-9)
    return {"AEE": aee, "PE1": pe1, "PE2": pe2, "PE3": pe3, "outlier": pct}


def aae_metric(pred, gt_flow, mask, flow_scaling=1.0):
    """Masked mean angular error in degrees (reference AAE)."""
    mask = mask.squeeze(1) if mask.ndim == 4 else mask
    flow = pred * flow_scaling
    flow_mag = jnp.sqrt((flow ** 2).sum(axis=1)) * mask
    gt_mag = jnp.sqrt((gt_flow ** 2).sum(axis=1)) * mask
    num_valid = mask.sum()
    dot = flow[:, 0] * gt_flow[:, 0] + flow[:, 1] * gt_flow[:, 1]
    cos = (dot + 1e-7) / (flow_mag * gt_mag + 1e-7)
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    aae = (jnp.arccos(cos) * mask).sum() / num_valid
    return aae * 180.0 / math.pi
