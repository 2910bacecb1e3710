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
                       updates_per_epoch: int, gamma: float = 0.5):
    """MultiStepLR: multiply lr by gamma at each milestone epoch.

    ``updates_per_epoch`` counts OPTIMIZER updates, not micro-batches: the
    schedule count that optax threads into the inner transform advances
    once per emitted update, so under gradient accumulation
    (``optax.MultiSteps``) boundaries expressed in micro-steps would fire
    ``num_acc``x too late. The reference steps MultiStepLR once per epoch
    regardless of accumulation (train_flow_parallel_supervised_SNN.py:
    488-489), i.e. epoch ``e`` trains at ``lr * gamma**|{m <= e}|``.
    """
    boundaries = {int(m) * updates_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


def onecycle_schedule(lr: float, n_epochs: int, updates_per_epoch: int,
                      pct_start: float = 0.01, div_factor: float = 25.0,
                      final_div_factor: float = 1e4, extra_steps: int = 100):
    """Torch-exact OneCycleLR as the reference constructs AND steps it.

    The reference builds ``OneCycleLR(max_lr=lr, total_steps=n_epochs+100,
    pct_start=0.01, anneal_strategy='linear')``
    (train_flow_parallel_supervised.py:174-181) and calls
    ``scheduler.step()`` once per EPOCH (:398-399). Two consequences this
    schedule reproduces exactly:

    - the LR is a per-epoch staircase (constant within an epoch), not a
      per-step ramp;
    - because of the ``+100`` the run traverses only the first
      ``n_epochs/(n_epochs+100)`` of the cycle — the LR never anneals to
      ``min_lr``.

    Piecewise-linear per torch's ``_annealing_linear``: warmup from
    ``lr/div_factor`` to ``lr`` over ``pct_start*total-1`` steps, then
    linear decay toward ``lr/div_factor/final_div_factor`` at
    ``total-1``.
    """
    total = float(n_epochs + extra_steps)
    initial = lr / div_factor
    min_lr = initial / final_div_factor
    end1 = pct_start * total - 1.0
    end2 = total - 1.0

    def schedule(count):
        epoch = jnp.asarray(count) // updates_per_epoch
        e = epoch.astype(jnp.result_type(float))
        warm = initial + (lr - initial) * jnp.minimum(e, end1) / end1
        pct = (jnp.minimum(e, end2) - end1) / (end2 - end1)
        ann = lr + (min_lr - lr) * pct
        return jnp.where(e <= end1, warm, ann)

    return schedule


def build_optimizer(*, name: str = "AdamW", lr: float = 1e-4,
                    weight_decay: float = 0.01, scheduler: str = "multistep",
                    milestones: Sequence[int] = (10, 20, 30, 40, 50, 70, 90, 120),
                    steps_per_epoch: int = 1000, n_epochs: int = 60,
                    gamma: float = 0.5, clip_grad: Optional[float] = 100.0,
                    num_acc: int = 1) -> optax.GradientTransformation:
    # Schedule counts advance per OPTIMIZER update (optax.MultiSteps holds
    # the inner state frozen between emissions), while steps_per_epoch
    # counts micro-batches; the reference emits ceil(batches/num_acc)
    # optimizer steps per epoch (update every num_acc batches, flushing the
    # remainder at epoch end — train_flow_parallel_supervised_SNN.py:
    # 327-336). optax.MultiSteps carries a partial accumulation across the
    # epoch boundary instead of flushing it, so when steps_per_epoch is not
    # divisible by num_acc the update COUNT drifts from the reference by
    # <1 update/epoch; the schedule mapping below is exact whenever it is
    # divisible (and all reference configs train full epochs).
    updates_per_epoch = max(-(-steps_per_epoch // num_acc), 1)
    if scheduler == "multistep":
        schedule = multistep_schedule(lr, milestones, updates_per_epoch,
                                      gamma)
    elif scheduler in ("one_cycle", "cycle"):
        schedule = onecycle_schedule(lr, n_epochs, updates_per_epoch)
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
        # Deliberate deviation: the reference applies clip_grad_norm_ after
        # EVERY micro-batch backward, re-clipping the partially accumulated
        # gradient num_acc times (train_flow_parallel_supervised_SNN.py:
        # 314-336); here the clip runs once on the accumulated mean.
        # Identical whenever the global norm stays under max_norm (shipped
        # configs clip at 100, far above observed norms ~O(1)); under
        # active clipping the reference's result depends on accumulation
        # order and cannot be expressed as a function of the mean gradient.
        tx = optax.MultiSteps(tx, every_k_schedule=num_acc)
    return tx
