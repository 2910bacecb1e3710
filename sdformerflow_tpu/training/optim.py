"""Optimizer / LR-schedule construction from config.

Parity targets: AdamW + MultiStepLR(gamma=0.5)
(/root/reference/train_flow_parallel_supervised_SNN.py:131-140), OneCycleLR
option (train_flow_parallel_supervised.py:174-181), global-norm grad clipping
at 100 (:323-324), gradient accumulation ``num_acc`` (:327-336).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


class SkipNonFiniteState(NamedTuple):
    notfinite_count: jnp.ndarray  # total skipped steps (observability)
    inner_state: optax.OptState


class GradNormGuardState(NamedTuple):
    notfinite_count: jnp.ndarray  # total skipped steps (observability)
    grad_norm: jnp.ndarray        # raw (pre-clip) global grad norm, f32
    inner_state: optax.OptState


def clip_and_skip_by_global_norm(
        inner: optax.GradientTransformation,
        max_norm: Optional[float] = None) -> optax.GradientTransformation:
    """Fuse clip-by-global-norm, non-finite skipping, and grad-norm
    telemetry into ONE ``global_norm`` reduction.

    ``chain(clip_by_global_norm, opt)`` wrapped in skip_nonfinite_updates
    plus a metrics-side ``optax.global_norm(grads)`` computes the same
    full-tree reduction three times per step; each pass re-reads (and on
    the bf16 path re-converts) every gradient leaf from HBM. This
    transform computes the norm once, exposes it in the state
    (``GradNormGuardState.grad_norm``) for metrics, and preserves the
    exact semantics of the unfused stack:

    - clipping matches ``optax.clip_by_global_norm``
      (``(t / g_norm.astype(t.dtype)) * max_norm`` when ``g_norm >=
      max_norm``), the reference's ``clip_grad_norm_(100)``
      (train_flow_parallel_supervised_SNN.py:323-324);
    - skipping matches :func:`skip_nonfinite_updates` (zero updates +
      unchanged inner state when the norm is non-finite).
    """

    def init(params):
        return GradNormGuardState(jnp.zeros([], jnp.int32),
                                  jnp.zeros([], jnp.float32),
                                  inner.init(params))

    def update(updates, state, params=None):
        g_norm = optax.global_norm(updates)
        ok = jnp.isfinite(g_norm)
        if max_norm is not None:
            trigger = g_norm < max_norm
            updates = jax.tree_util.tree_map(
                lambda t: jnp.where(trigger, t,
                                    (t / g_norm.astype(t.dtype)) * max_norm),
                updates)
        new_updates, new_inner = inner.update(updates, state.inner_state,
                                              params)
        new_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), new_updates)
        new_inner = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_inner, state.inner_state)
        count = state.notfinite_count + jnp.where(ok, 0, 1).astype(jnp.int32)
        return new_updates, GradNormGuardState(
            count, g_norm.astype(jnp.float32), new_inner)

    return optax.GradientTransformation(init, update)


def skip_nonfinite_updates(
        inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Skip updates whose gradients contain NaN/inf — cheap variant of
    ``optax.apply_if_finite``.

    apply_if_finite materializes an ``isfinite`` reduction over every
    gradient leaf and runs the inner transformation inside a ``lax.cond``;
    on TPU the cond blocks fusion and forces operand copies — measured
    10.5 ms/step on the flagship train step (PERF_NOTES.md round 3). This
    transform instead tests ``isfinite(global_norm(updates))`` — a single
    fused reduction; any NaN or inf leaf poisons the norm — and selects
    with ``jnp.where`` (both branches are elementwise-cheap). A finite
    overflow of the squared-norm sum (grads ~1e19) also skips, which is the
    conservative behavior. Semantics otherwise match apply_if_finite:
    non-finite steps emit zero updates and keep the inner state unchanged.
    """

    def init(params):
        return SkipNonFiniteState(jnp.zeros([], jnp.int32),
                                  inner.init(params))

    def update(updates, state, params=None):
        ok = jnp.isfinite(optax.global_norm(updates))
        new_updates, new_inner = inner.update(updates, state.inner_state,
                                              params)
        new_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), new_updates)
        new_inner = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_inner, state.inner_state)
        count = state.notfinite_count + jnp.where(ok, 0, 1).astype(jnp.int32)
        return new_updates, SkipNonFiniteState(count, new_inner)

    return optax.GradientTransformation(init, update)


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
        # torch AdamW SKIPS parameters whose .grad is None — in the
        # reference the attention-telemetry neuron (attn_sn, whose output
        # attn_scores never reaches the loss) is exactly such a parameter
        # set, so its params stay at init across training. optax computes
        # structural zero gradients instead and would weight-decay them;
        # mask the decay for those subtrees to match the trained reference
        # checkpoints bit-for-bit (found by tests/test_train_step_parity.py).
        def _decay_mask(params):
            def walk(tree, unused):
                if not isinstance(tree, dict):
                    return not unused
                return {k: walk(v, unused or k == "attn_sn")
                        for k, v in tree.items()}
            return walk(params, False)

        opt = optax.adamw(schedule, weight_decay=weight_decay,
                          mask=_decay_mask)
    elif name.lower() == "adam":
        opt = optax.adam(schedule)
    elif name.lower() == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    # skip non-finite updates instead of poisoning the params: pathological
    # batches (e.g. an event-free crop, where every BatchNorm amplifies
    # gradients by ~1/sqrt(eps)) can overflow the gradient norm; torch's
    # clip_grad_norm_ scales such grads to ~zero, and this is the optax
    # equivalent (see skip_nonfinite_updates for why not apply_if_finite).
    # Clip + skip + telemetry share one fused global_norm pass.
    tx = clip_and_skip_by_global_norm(opt, max_norm=clip_grad)
    if num_acc > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=num_acc)
    return tx
