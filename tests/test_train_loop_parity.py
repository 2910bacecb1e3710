"""DRIVER-LOOP A/B vs the reference's actual loop body (VERDICT r3 #5).

The step and trajectory A/Bs (test_train_step_parity.py) start at the
normalized tensor; this test composes the remaining per-batch glue through
the REAL driver, ``train_loop.train()``: batch iteration/shuffle ->
(identity) augmentation -> polarity split relu(+-x) -> nonzero minmax norm
-> spike_th binarize -> forward -> multi-scale loss -> clip -> AdamW step ->
per-epoch MultiStepLR -> best-epoch checkpoint -> validation every epoch
with the batch_size==1 train-mode-BN quirk — against a hand-run torch loop
following /root/reference/train_flow_parallel_supervised_SNN.py:229-489
line by line, in f64. Asserts the logged train/valid losses per epoch AND
the final params + BN running stats per leaf.

Alignment choices (all documented reference deviations or RNG seams):
- augmentation off on both sides (torch RNG and JAX PRNG streams cannot be
  aligned; the augmentations themselves are A/B'd in
  test_data_pipeline_parity.py);
- DropPath rate 0.0 (same reason);
- batch order: the torch loop consumes batches from OUR
  ``data.dsec.batch_iterator`` with the same seed, so both sides see the
  same shuffled order (the shuffler itself is not a parity surface);
- the reference's train-mode validation forward UPDATES the BN running
  stats (train_..._SNN.py:382-385 + torch BN semantics); our validate()
  deliberately discards them (make_eval_step docstring). The torch side
  snapshots/restores its BN buffers around validation to emulate our
  semantics — the validation LOSSES still come from train-mode batch
  statistics on both sides, which is the quirk under test;
- reference logs epoch_loss = sum(loss.item() * batch_size) / n_batches;
  with batch_size == 1 (required by the quirk anyway) this equals our
  per-sample mean.
"""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from refharness import import_reference_models, sj_functional  # noqa: E402
from test_reference_parity import _snn_cfg, f64  # noqa: E402,F401

import jax  # noqa: E402


class _ArrayDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _encode_ref(torch, chunk, norm_input="minmax", spike_th=None):
    """The reference loop's in-line encoding, verbatim semantics
    (train_flow_parallel_supervised_SNN.py:259-296)."""
    neg = torch.nn.functional.relu(-chunk)
    pos = torch.nn.functional.relu(chunk)
    chunk = torch.cat((torch.unsqueeze(pos, dim=2),
                       torch.unsqueeze(neg, dim=2)), dim=2)
    if norm_input == "minmax":
        mn, mx = torch.min(chunk[chunk != 0]), torch.max(chunk[chunk != 0])
        if not mn == mx:
            chunk[chunk != 0] = (chunk[chunk != 0] - mn) / (mx - mn)
    if spike_th is not None:
        chunk[chunk > spike_th] = 1
        chunk[chunk < spike_th] = 0
    return chunk


def test_driver_loop_parity(f64, tmp_path, monkeypatch):
    torch = f64
    import importlib
    sys.path.insert(0, "/root/reference")
    ref_loss_mod = importlib.import_module("loss.flow_supervised")
    ref_snn, _ = import_reference_models()

    from sdformerflow_tpu.data.dsec import batch_iterator
    from sdformerflow_tpu.training import torch_interop as TI
    from sdformerflow_tpu.training import train_loop
    from sdformerflow_tpu.training.train_step import TrainState

    m_cfg, s_cfg = _snn_cfg(
        "MS_SpikingformerFlowNet_en4", "psn", (1, 1, 1, 1), (2, 2, 4, 4),
        "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
    s_cfg["drop_path_rate"] = 0.0
    lr, wd, clip, spike_th = 1e-3, 0.01, 100.0, 0.05
    n_epochs, seed = 2, 0

    # --- data: 2 train + 2 valid samples, f64 signed voxel grids
    rng = np.random.RandomState(33)

    def item():
        return (rng.randn(10, 96, 96) * 0.5,
                (rng.rand(96, 96) > 0.3).astype(np.float64),
                rng.randn(2, 96, 96))

    train_items = [item() for _ in range(2)]
    valid_items = [item() for _ in range(2)]

    # --- torch reference state at a common init
    functional = sj_functional()
    torch.manual_seed(0)
    tmodel = ref_snn.MS_SpikingformerFlowNet_en4(m_cfg.copy(), s_cfg.copy())
    tmodel.init_weights()
    functional.reset_net(tmodel)
    functional.set_step_mode(tmodel, "m")
    tmodel.double()
    sd0 = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}

    # --- the JAX side: the REAL driver, params injected from sd0
    config = {
        "experiment": "loop-parity",
        "model": m_cfg, "swin_transformer": s_cfg,
        "data": {"preprocessed": True, "num_frames": 10, "num_chunks": 1,
                 "spike_th": spike_th},
        "loss": {"lambda_mod": 1, "gamma": None, "clip_grad": clip},
        "optimizer": {"name": "AdamW", "lr": lr, "wd": wd,
                      "scheduler": "multistep", "milestones": [1]},
        "loader": {"n_epochs": n_epochs, "batch_size": 1, "seed": seed,
                   "polarity": True, "save_on_preempt": False},
        "metrics": {"name": ["AEE"], "flow_scaling": 1,
                    "mask_events": False},
        "test": {"sample": 40, "n_valid": 1},
    }

    depths = tuple(s_cfg["swin_depths"])
    params0, bs0, unmatched = TI.convert_state_dict(
        sd0, num_stages=len(depths), max_depth=max(depths),
        num_encoders=len(depths), family="snn")
    unmatched = [k for k in unmatched
                 if "relative_position_index" not in k
                 and "relative_coords_table" not in k]
    assert unmatched == []

    def inject_state(model, tx, sample_chunk, rng_, train=True):
        return TrainState.create(apply_fn=model.apply, params=params0,
                                 batch_stats=bs0, tx=tx)

    monkeypatch.setattr(train_loop, "create_train_state", inject_state)

    with jax.enable_x64(True):
        final_state = train_loop.train(
            config, _ArrayDataset(train_items), _ArrayDataset(valid_items),
            run_dir=str(tmp_path / "run"))

    logged = {}
    with open(tmp_path / "run" / "metrics.jsonl") as fh:
        for line in fh:
            rec = json.loads(line)
            logged[(rec["name"], rec["step"])] = rec["value"]

    # --- torch loop following the reference driver line by line
    import timm.models.layers as tml
    orig_dp = tml.DropPath.forward
    tml.DropPath.forward = lambda self, x: x
    try:
        loss_cfg = {"metrics": {"flow_scaling": 1.0},
                    "loss": {"lambda_mod": 1.0, "lambda_ang": 0.0}}
        loss_fn = ref_loss_mod.flow_loss_supervised(loss_cfg, device="cpu")
        opt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=wd)
        sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[1],
                                                     gamma=0.5)
        t_train_losses, t_valid_losses = [], []
        for epoch in range(n_epochs):
            tmodel.train()
            train_loss, n_batches = 0.0, 0
            for batch in batch_iterator(_ArrayDataset(train_items), 1,
                                        shuffle=True, seed=seed + epoch):
                functional.reset_net(tmodel)
                functional.set_step_mode(tmodel, "m")
                chunk = _encode_ref(torch, torch.from_numpy(batch["chunk"]),
                                    spike_th=spike_th)
                label = torch.from_numpy(batch["label"])
                mask = torch.from_numpy(batch["mask"].astype(np.float64))
                pred = tmodel(chunk)
                loss = loss_fn(pred["flow"], label, mask, gamma=None)
                opt.zero_grad()
                loss.backward()
                torch.nn.utils.clip_grad.clip_grad_norm_(
                    tmodel.parameters(), clip)
                opt.step()
                train_loss += float(loss.item())
                n_batches += 1
            t_train_losses.append(train_loss / n_batches)

            # validation: batch_size == 1 -> model stays in TRAIN mode
            # (train_..._SNN.py:382-385); BN buffers snapshotted/restored to
            # emulate our documented no-contamination semantics
            bn_snapshot = {k: v.clone() for k, v in tmodel.state_dict().items()
                           if "running_" in k or "num_batches_tracked" in k}
            vloss, n_val = 0.0, 0
            with torch.no_grad():
                for batch in batch_iterator(_ArrayDataset(valid_items), 1):
                    functional.reset_net(tmodel)
                    functional.set_step_mode(tmodel, "m")
                    chunk = _encode_ref(
                        torch, torch.from_numpy(batch["chunk"]),
                        spike_th=spike_th)
                    pred = tmodel(chunk)["flow"][-1]
                    vloss += float(loss_fn(
                        [pred], torch.from_numpy(batch["label"]),
                        torch.from_numpy(
                            batch["mask"].astype(np.float64))).item())
                    n_val += 1
            t_valid_losses.append(vloss / n_val)
            sd = tmodel.state_dict()
            for k, v in bn_snapshot.items():
                sd[k].copy_(v)
            sched.step()
        sd_final = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}
    finally:
        tml.DropPath.forward = orig_dp

    # --- logged losses per epoch
    for epoch in range(n_epochs):
        np.testing.assert_allclose(
            # rtol 1e-7: epoch>0 losses sit downstream of AdamW updates,
            # where f64 reduction-order noise (~1e-15 rel on grads) is
            # amplified by rsqrt(v)+eps to ~1e-9 on the loss; a semantic
            # mismatch in any composed stage shows at >=1e-2
            logged[("train_loss", epoch)], t_train_losses[epoch], rtol=1e-7,
            err_msg=f"train_loss epoch {epoch}")
        np.testing.assert_allclose(
            logged[("valid_loss", epoch)], t_valid_losses[epoch], rtol=1e-7,
            err_msg=f"valid_loss epoch {epoch}")

    # --- final params + BN running stats per leaf
    params1, bs1, _ = TI.convert_state_dict(
        sd_final, num_stages=len(depths), max_depth=max(depths),
        num_encoders=len(depths), family="snn")

    def _leaves(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict) or hasattr(v, "keys"):
                out.update(_leaves(v, p))
            else:
                out[p] = np.asarray(v)
        return out

    want_p, got_p = _leaves(params1), _leaves(final_state.params)
    assert set(want_p) == set(got_p)
    for k in sorted(want_p):
        # update-scale tolerance (see test_train_step_parity rationale)
        np.testing.assert_allclose(got_p[k], want_p[k], rtol=1e-7,
                                   atol=lr * 1e-2, err_msg=f"param {k}")
    want_s, got_s = _leaves(bs1), _leaves(final_state.batch_stats)
    assert set(want_s) == set(got_s) and len(want_s) > 0
    for k in sorted(want_s):
        rel = np.abs(want_s[k] - got_s[k]).max() / (
            np.abs(want_s[k]).max() + 1e-12)
        adiff = np.abs(want_s[k] - got_s[k]).max()
        # epoch-2 stats are computed from forwards through params that
        # already carry ~1e-9..1e-8 of f64 reduction-order noise from four
        # AdamW+clip updates (observed: abs ~2e-8 on stats of scale 0.05);
        # a semantic mismatch (momentum, validation contamination, extra
        # update) shows at the momentum*stat scale ~5e-3
        assert rel < 1e-6 or adiff < 1e-7, \
            f"batch_stat {k}: rel {rel:.3e} abs {adiff:.3e}"
