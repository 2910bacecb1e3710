"""LR-schedule A/B vs torch's own schedulers, as the reference steps them.

The reference steps its scheduler once per EPOCH
(/root/reference/train_flow_parallel_supervised_SNN.py:488-489,
train_flow_parallel_supervised.py:398-399), while optax threads a count
that advances once per OPTIMIZER update — and under gradient accumulation
(optax.MultiSteps) the inner state is frozen between emissions, so the
count advances once per num_acc micro-batches. These tests lock the
count -> epoch mapping and the torch-exact OneCycleLR formula
(total_steps = n_epochs + 100, pct_start = 0.01, anneal_strategy='linear',
train_flow_parallel_supervised.py:174-181).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp
import optax

from sdformerflow_tpu.training.optim import (build_optimizer,
                                             multistep_schedule,
                                             onecycle_schedule)

pytestmark = pytest.mark.smoke


@pytest.mark.parametrize("num_acc", [1, 2])
def test_multistep_schedule_vs_torch(num_acc):
    lr, gamma, milestones = 1e-3, 0.5, [1, 3]
    steps_per_epoch, n_epochs = 4, 6
    updates_per_epoch = steps_per_epoch // num_acc

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=milestones,
                                                 gamma=gamma)
    ours = multistep_schedule(lr, milestones, updates_per_epoch, gamma)

    count = 0
    for epoch in range(n_epochs):
        torch_lr = opt.param_groups[0]["lr"]
        for _ in range(updates_per_epoch):
            np.testing.assert_allclose(float(ours(count)), torch_lr,
                                       rtol=1e-6,
                                       err_msg=f"epoch {epoch} count {count}")
            count += 1
        sched.step()


def test_onecycle_schedule_vs_torch():
    """Torch-exact OneCycleLR with the reference's construction, stepped
    per epoch: only the first n_epochs/(n_epochs+100) of the cycle runs."""
    lr, n_epochs, updates_per_epoch = 5e-4, 60, 3

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr, total_steps=n_epochs + 100, pct_start=0.01,
        cycle_momentum=False, anneal_strategy="linear")
    ours = onecycle_schedule(lr, n_epochs, updates_per_epoch)

    count = 0
    for epoch in range(n_epochs):
        torch_lr = opt.param_groups[0]["lr"]
        for _ in range(updates_per_epoch):
            np.testing.assert_allclose(float(ours(count)), torch_lr,
                                       rtol=1e-6,
                                       err_msg=f"epoch {epoch} count {count}")
            count += 1
        sched.step()
    # non-vacuous: the staircase both warmed up and decayed, and the decay
    # stops far above min_lr because of the reference's +100 total_steps
    lrs = [float(ours(e * updates_per_epoch)) for e in range(n_epochs)]
    assert lrs[0] == pytest.approx(lr / 25.0)
    # warmup ends at pct_start*(n_epochs+100)-1 = 0.6, between integer
    # epochs, so the sampled staircase peaks just below max_lr
    assert max(lrs) > 0.99 * lr
    assert lrs[-1] > lr * 0.5  # nowhere near min_lr = lr/25/1e4


@pytest.mark.parametrize("num_acc", [1, 2])
def test_build_optimizer_milestone_fires_per_epoch(num_acc):
    """End-to-end through build_optimizer: with gradient accumulation the
    LR must still halve at the milestone EPOCH, not num_acc epochs later.

    Adam with a constant gradient g has mhat/sqrt(vhat) == 1 at every step,
    so each emitted update is -lr_t * g/(|g| + eps): the update magnitude
    reads the schedule directly.
    """
    lr, steps_per_epoch, milestones = 1e-3, 4, [1]
    tx = build_optimizer(name="adam", lr=lr, scheduler="multistep",
                         milestones=milestones,
                         steps_per_epoch=steps_per_epoch,
                         clip_grad=None, num_acc=num_acc)
    params = {"w": jnp.zeros((3,))}
    grads = {"w": jnp.ones((3,))}
    state = tx.init(params)

    per_epoch_updates = []
    for epoch in range(2):
        emitted = []
        for _ in range(steps_per_epoch):
            updates, state = tx.update(grads, state, params)
            mag = float(jnp.abs(updates["w"]).max())
            if mag > 0:
                emitted.append(mag)
        assert len(emitted) == steps_per_epoch // num_acc
        per_epoch_updates.append(emitted)

    for mag in per_epoch_updates[0]:
        assert mag == pytest.approx(lr, rel=1e-4)
    for mag in per_epoch_updates[1]:  # milestone epoch: halved lr
        assert mag == pytest.approx(lr / 2, rel=1e-4)
