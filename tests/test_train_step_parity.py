"""Full TRAIN-step A/B vs the reference (VERDICT r2 #5).

Locks the training semantics the eval-mode gradient A/B cannot see: train-
mode BatchNorm (batch statistics used for normalization, running stats
updated with torch momentum/unbiased-variance), the reference's
flow_loss_supervised over all scales, backward, global-norm clipping at 100,
and one AdamW update — comparing the UPDATED BN running stats and the
POST-STEP parameters per leaf in f64.

Reference protocol: train_flow_parallel_supervised_SNN.py:299-336 (train()
forward -> loss -> backward -> clip_grad_norm_ -> AdamW.step()),
loss/flow_supervised.py:81-105, AdamW construction :131-140.

DropPath is forced to identity on both sides (torch bernoulli and JAX PRNG
streams cannot be aligned); everything else runs the real train path.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from refharness import import_reference_models, sj_functional  # noqa: E402
from test_reference_parity import _snn_cfg, f64  # noqa: E402,F401

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdformerflow_tpu.losses import flow_loss_supervised  # noqa: E402
from sdformerflow_tpu.models import get_model  # noqa: E402
from sdformerflow_tpu.training import torch_interop as TI  # noqa: E402
from sdformerflow_tpu.training.config import build_configs  # noqa: E402
from sdformerflow_tpu.training.optim import build_optimizer  # noqa: E402


def _leaf_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_leaf_paths(v, p))
        else:
            out[p] = v
    return out


def test_train_step_parity(f64):
    torch = f64
    import importlib
    sys.path.insert(0, "/root/reference")
    ref_loss_mod = importlib.import_module("loss.flow_supervised")
    ref_snn, _ = import_reference_models()

    # identity DropPath on both sides (see module docstring)
    import timm.models.layers as tml
    orig_dp = tml.DropPath.forward
    tml.DropPath.forward = lambda self, x: x
    try:
        m_cfg_d, s_cfg_d = _snn_cfg(
            "MS_SpikingformerFlowNet_en4", "psn", (1, 2, 1, 1), (2, 2, 4, 4),
            "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
        s_cfg_d["drop_path_rate"] = 0.0
        lr, wd, clip = 1e-3, 0.01, 100.0

        functional = sj_functional()
        torch.manual_seed(0)
        tmodel = ref_snn.MS_SpikingformerFlowNet_en4(m_cfg_d.copy(),
                                                     s_cfg_d.copy())
        tmodel.init_weights()
        functional.reset_net(tmodel)
        functional.set_step_mode(tmodel, "m")
        tmodel.double()
        tmodel.train()

        rng = np.random.RandomState(21)
        x_np = rng.rand(2, 10, 2, 96, 96).astype(np.float64)
        label_np = rng.randn(2, 2, 96, 96).astype(np.float64)
        mask_np = (rng.rand(2, 1, 96, 96) > 0.3).astype(np.float64)

        # capture pre-step state for the JAX side
        sd0 = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}

        loss_cfg = {"metrics": {"flow_scaling": 1.0},
                    "loss": {"lambda_mod": 1.0, "lambda_ang": 0.0}}
        loss_fn = ref_loss_mod.flow_loss_supervised(loss_cfg, device="cpu")
        opt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=wd)
        pred = tmodel(torch.from_numpy(x_np))
        tloss = loss_fn(pred["flow"], torch.from_numpy(label_np),
                        torch.from_numpy(mask_np), gamma=None)
        opt.zero_grad()
        tloss.backward()
        torch.nn.utils.clip_grad.clip_grad_norm_(tmodel.parameters(), clip)
        opt.step()
        sd1 = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}

        # ---- JAX replica from the PRE-step state
        cfg = {"model": m_cfg_d, "swin_transformer": s_cfg_d, "loader": {}}
        mc, swin, spiking = build_configs(cfg)
        fmodel = get_model(m_cfg_d["name"], mc, swin, spiking)
        depths = swin.depths
        params, bs, unmatched = TI.convert_state_dict(
            sd0, num_stages=len(depths), max_depth=max(depths),
            num_encoders=len(depths), family="snn")
        unmatched = [k for k in unmatched
                     if "relative_position_index" not in k
                     and "relative_coords_table" not in k]
        assert unmatched == []

        tx = build_optimizer(name="AdamW", lr=lr, weight_decay=wd,
                             scheduler="constant", clip_grad=clip,
                             steps_per_epoch=1)

        def loss_and_stats(p, bstats, x, label, mask):
            out, mutated = fmodel.apply(
                {"params": p, "batch_stats": bstats}, x, True,
                mutable=["batch_stats"],
                rngs={"droppath": jax.random.PRNGKey(0)})
            loss = flow_loss_supervised(out["flow"], label, mask,
                                        flow_scaling=1.0, gamma=None)
            return loss, mutated["batch_stats"]

        (floss, new_bs), grads = jax.value_and_grad(
            loss_and_stats, has_aux=True)(
            params, bs, jnp.asarray(x_np), jnp.asarray(label_np),
            jnp.asarray(mask_np))
        opt_state = tx.init(params)
        import optax
        updates, _ = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # loss parity
        np.testing.assert_allclose(float(floss), float(tloss.item()),
                                   rtol=1e-10)

        # post-step params + updated running stats, leaf by leaf: convert
        # the POST-step torch state and compare against the JAX post-step
        params1, bs1, _ = TI.convert_state_dict(
            sd1, num_stages=len(depths), max_depth=max(depths),
            num_encoders=len(depths), family="snn")
        want_p = _leaf_paths(params1)
        got_p = _leaf_paths(jax.tree_util.tree_map(np.asarray, new_params))
        assert set(want_p) == set(got_p)
        for key in sorted(want_p):
            w, g = np.asarray(want_p[key]), got_p[key]
            # tolerance on the UPDATE scale: near-zero-gradient leaves get
            # sign-amplified by Adam's first step (lr*g/(sqrt(g^2)+eps)), so
            # f64 gradient noise ~1e-14 can flip an O(lr) update component;
            # any semantic mismatch would be O(lr) itself, far above lr*1e-3.
            np.testing.assert_allclose(
                g, w, rtol=1e-8, atol=lr * 1e-3,
                err_msg=f"param {key}")
        want_s = _leaf_paths(bs1)
        got_s = _leaf_paths(jax.tree_util.tree_map(np.asarray, new_bs))
        assert set(want_s) == set(got_s) and len(want_s) > 0
        for key in sorted(want_s):
            w, g = np.asarray(want_s[key]), got_s[key]
            denom = np.abs(w).max() + 1e-12
            rel = np.abs(w - g).max() / denom
            assert rel < 1e-9, f"batch_stat {key}: rel {rel:.3e}"
        # non-vacuous: the step actually moved the params
        moved = max(np.abs(np.asarray(v) - np.asarray(_leaf_paths(
            jax.tree_util.tree_map(np.asarray, params))[k])).max()
            for k, v in got_p.items())
        assert moved > 1e-6
    finally:
        tml.DropPath.forward = orig_dp


def test_train_trajectory_parity_accum_milestone(f64):
    """Multi-step TRAINING-TRAJECTORY A/B vs the reference loop: gradient
    accumulation (num_acc=2) + a MultiStepLR milestone + Adam state and BN
    running stats evolving across updates.

    Reference semantics locked here (train_flow_parallel_supervised_SNN.py):
    - loss is divided by num_acc before backward (:307-308), so grads
      accumulate as the MEAN across micro-batches == optax.MultiSteps;
    - optimizer.step() fires every num_acc micro-batches (:327-336);
    - MultiStepLR steps once per EPOCH (:488-489) — with accumulation the
      milestone must fire at the milestone epoch measured in OPTIMIZER
      updates, which optax counts (MultiSteps freezes the inner count
      between emissions). The pre-fix micro-step boundary fired num_acc x
      too late and fails this test.

    Clipping is disabled: the reference clips the PARTIALLY accumulated
    gradient after every micro-backward (:323-324), which is not a function
    of the mean gradient (see optim.build_optimizer) — with clip inactive
    both loops are exactly equivalent, which this test asserts in f64.

    4 micro-batches = 2 optimizer updates = 2 epochs (2 micro-batches each,
    steps_per_epoch=2, num_acc=2), milestone at epoch 1 so the second
    update runs at lr/2.
    """
    torch = f64
    import importlib
    sys.path.insert(0, "/root/reference")
    ref_loss_mod = importlib.import_module("loss.flow_supervised")
    ref_snn, _ = import_reference_models()

    import timm.models.layers as tml
    orig_dp = tml.DropPath.forward
    tml.DropPath.forward = lambda self, x: x
    try:
        m_cfg_d, s_cfg_d = _snn_cfg(
            "MS_SpikingformerFlowNet_en4", "psn", (1, 1, 1, 1), (2, 2, 4, 4),
            "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
        s_cfg_d["drop_path_rate"] = 0.0
        lr, wd = 1e-3, 0.01
        num_acc, steps_per_epoch, n_micro = 2, 2, 4

        functional = sj_functional()
        torch.manual_seed(0)
        tmodel = ref_snn.MS_SpikingformerFlowNet_en4(m_cfg_d.copy(),
                                                     s_cfg_d.copy())
        tmodel.init_weights()
        functional.reset_net(tmodel)
        functional.set_step_mode(tmodel, "m")
        tmodel.double()
        tmodel.train()

        rng = np.random.RandomState(7)
        batches = [(rng.rand(1, 10, 2, 96, 96).astype(np.float64),
                    rng.randn(1, 2, 96, 96).astype(np.float64),
                    (rng.rand(1, 1, 96, 96) > 0.3).astype(np.float64))
                   for _ in range(n_micro)]

        sd0 = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}

        loss_cfg = {"metrics": {"flow_scaling": 1.0},
                    "loss": {"lambda_mod": 1.0, "lambda_ang": 0.0}}
        loss_fn = ref_loss_mod.flow_loss_supervised(loss_cfg, device="cpu")
        opt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=wd)
        sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[1],
                                                     gamma=0.5)
        opt.zero_grad()
        tlosses = []
        for i, (x_np, label_np, mask_np) in enumerate(batches):
            pred = tmodel(torch.from_numpy(x_np))
            tloss = loss_fn(pred["flow"], torch.from_numpy(label_np),
                            torch.from_numpy(mask_np), gamma=None) / num_acc
            tloss.backward()
            tlosses.append(float(tloss.item()))
            if (i + 1) % num_acc == 0:
                opt.step()
                opt.zero_grad()
            if (i + 1) % steps_per_epoch == 0:
                sched.step()
        sd1 = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}

        # ---- JAX replica from the PRE-step state
        cfg = {"model": m_cfg_d, "swin_transformer": s_cfg_d, "loader": {}}
        mc, swin, spiking = build_configs(cfg)
        fmodel = get_model(m_cfg_d["name"], mc, swin, spiking)
        depths = swin.depths
        params, bs, unmatched = TI.convert_state_dict(
            sd0, num_stages=len(depths), max_depth=max(depths),
            num_encoders=len(depths), family="snn")
        unmatched = [k for k in unmatched
                     if "relative_position_index" not in k
                     and "relative_coords_table" not in k]
        assert unmatched == []

        tx = build_optimizer(name="AdamW", lr=lr, weight_decay=wd,
                             scheduler="multistep", milestones=[1],
                             steps_per_epoch=steps_per_epoch,
                             clip_grad=None, num_acc=num_acc)

        def loss_and_stats(p, bstats, x, label, mask):
            out, mutated = fmodel.apply(
                {"params": p, "batch_stats": bstats}, x, True,
                mutable=["batch_stats"],
                rngs={"droppath": jax.random.PRNGKey(0)})
            loss = flow_loss_supervised(out["flow"], label, mask,
                                        flow_scaling=1.0, gamma=None)
            return loss, mutated["batch_stats"]

        import optax
        opt_state = tx.init(params)
        grad_fn = jax.value_and_grad(loss_and_stats, has_aux=True)
        for i, (x_np, label_np, mask_np) in enumerate(batches):
            (floss, bs), grads = grad_fn(params, bs, jnp.asarray(x_np),
                                         jnp.asarray(label_np),
                                         jnp.asarray(mask_np))
            # reference reports loss/num_acc; grads are equivalent because
            # MultiSteps averages what the reference sums pre-divided
            np.testing.assert_allclose(float(floss) / num_acc, tlosses[i],
                                       rtol=1e-9,
                                       err_msg=f"micro-step {i} loss")
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

        params1, bs1, _ = TI.convert_state_dict(
            sd1, num_stages=len(depths), max_depth=max(depths),
            num_encoders=len(depths), family="snn")
        want_p = _leaf_paths(params1)
        got_p = _leaf_paths(jax.tree_util.tree_map(np.asarray, params))
        assert set(want_p) == set(got_p)
        for key in sorted(want_p):
            w, g = np.asarray(want_p[key]), got_p[key]
            # same update-scale tolerance rationale as the 1-step test
            np.testing.assert_allclose(g, w, rtol=1e-8, atol=lr * 1e-3,
                                       err_msg=f"param {key}")
        want_s = _leaf_paths(bs1)
        got_s = _leaf_paths(jax.tree_util.tree_map(np.asarray, bs))
        assert set(want_s) == set(got_s) and len(want_s) > 0
        for key in sorted(want_s):
            w, g = np.asarray(want_s[key]), got_s[key]
            # absolute floor: at a near-dead attention site (random init,
            # spikes ~all zero) the batch means are ~1e-10 — cancellation
            # noise, different between frameworks — while any semantic
            # mismatch (momentum, unbiased var) shows at the stat's own
            # scale. rel for live stats, atol for noise-scale ones.
            rel = np.abs(w - g).max() / (np.abs(w).max() + 1e-12)
            adiff = np.abs(w - g).max()
            assert rel < 1e-9 or adiff < 1e-9, \
                f"batch_stat {key}: rel {rel:.3e} abs {adiff:.3e}"
    finally:
        tml.DropPath.forward = orig_dp
