"""Optimizer / LR-schedule construction from config.

Parity targets: AdamW + MultiStepLR(gamma=0.5)
(/root/reference/train_flow_parallel_supervised_SNN.py:131-140), OneCycleLR
option (train_flow_parallel_supervised.py:174-181), global-norm grad clipping
at 100 (:323-324), gradient accumulation ``num_acc`` (:327-336).
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def multistep_schedule(lr: float, milestones: Sequence[int],
                       steps_per_epoch: int, gamma: float = 0.5):
    """MultiStepLR: multiply lr by gamma at each milestone epoch."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


def onecycle_schedule(lr: float, total_steps: int):
    return optax.cosine_onecycle_schedule(transition_steps=total_steps,
                                          peak_value=lr)


def build_optimizer(*, name: str = "AdamW", lr: float = 1e-4,
                    weight_decay: float = 0.01, scheduler: str = "multistep",
                    milestones: Sequence[int] = (10, 20, 30, 40, 50, 70, 90, 120),
                    steps_per_epoch: int = 1000, n_epochs: int = 60,
                    gamma: float = 0.5, clip_grad: Optional[float] = 100.0,
                    num_acc: int = 1) -> optax.GradientTransformation:
    if scheduler == "multistep":
        schedule = multistep_schedule(lr, milestones, steps_per_epoch, gamma)
    elif scheduler == "one_cycle":
        schedule = onecycle_schedule(lr, steps_per_epoch * n_epochs)
    else:
        schedule = lr

    if name.lower() == "adamw":
        opt = optax.adamw(schedule, weight_decay=weight_decay)
    elif name.lower() == "adam":
        opt = optax.adam(schedule)
    elif name.lower() == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    parts = []
    if clip_grad is not None:
        parts.append(optax.clip_by_global_norm(clip_grad))
    parts.append(opt)
    tx = optax.chain(*parts)
    # skip non-finite updates instead of poisoning the params: pathological
    # batches (e.g. an event-free crop, where every BatchNorm amplifies
    # gradients by ~1/sqrt(eps)) can overflow the gradient norm; torch's
    # clip_grad_norm_ scales such grads to ~zero, and this is the optax
    # equivalent
    tx = optax.apply_if_finite(tx, max_consecutive_errors=10000)
    if num_acc > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=num_acc)
    return tx
