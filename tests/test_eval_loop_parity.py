"""Composed EVAL-loop A/B vs the reference's standalone eval protocol.

test_train_loop_parity.py covers the TRAINING driver's composed loop; this
covers the standalone evaluators (scripts/eval_dsec.py, eval_mvsec.py):
batch iteration (drop_last=False) -> encode (polarity split -> nonzero
minmax norm -> spike_th binarize) -> model.EVAL()-mode forward (running-stat
BN — the reference eval scripts never apply the training-validation batch-1
train-mode quirk: eval_DSEC_flow_SNN.py:125, eval_MV_flow_SNN.py:142) ->
mask_events from the ENCODED chunk's footprint (eval_MV_flow_SNN.py:217-219)
-> AEE/PE/outlier/AAE via the reference's own metric classes -> per-SAMPLE
accumulation divided by the total sample count (eval_*.py:236-287).

Run against a hand-run torch loop following eval_MV_flow_SNN.py:143-290 line
by line in f64, using the reference's OWN loss/flow_supervised.py metric
classes. The JAX side uses the same building blocks the drivers use:
make_eval_step(use_batch_stats=False) + training.evaluate.make_metrics_fn +
MetricsAccumulator.

Out of scope here (covered elsewhere): the center-crop transform
(test_data_pipeline_parity.py), the loaders themselves
(test_mvsec_dsec_loader_parity.py), metric formulas in isolation
(test_losses.py).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from refharness import import_reference_models, sj_functional  # noqa: E402
from test_reference_parity import _snn_cfg, f64  # noqa: E402,F401

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class _ArrayDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _encode_ref(torch, chunk, norm_input="minmax", spike_th=None):
    """The reference eval loop's in-line encoding, verbatim semantics
    (eval_MV_flow_SNN.py:175-215)."""
    neg = torch.nn.functional.relu(-chunk)
    pos = torch.nn.functional.relu(chunk)
    chunk = torch.cat((torch.unsqueeze(pos, dim=2),
                       torch.unsqueeze(neg, dim=2)), dim=2)
    if norm_input == "minmax":
        mn, mx = torch.min(chunk[chunk != 0]), torch.max(chunk[chunk != 0])
        if not mn == mx:
            chunk[chunk != 0] = (chunk[chunk != 0] - mn) / (mx - mn)
    elif norm_input == "std":
        mean, std = chunk[chunk != 0].mean(), chunk[chunk != 0].std()
        if std > 0:
            chunk[chunk != 0] = (chunk[chunk != 0] - mean) / std
    if spike_th is not None:
        chunk[chunk > spike_th] = 1
        chunk[chunk < spike_th] = 0
    return chunk


def _ref_accumulate(torch, ref_loss_mod, preds, labels, masks, chunks,
                    flow_scaling, mask_events, batch_size):
    """The reference eval accumulation, line by line
    (eval_MV_flow_SNN.py:217-290): per-batch AEE/AAE from the reference's
    own classes, summed per sample, divided by the sample count."""
    val = {"AEE": 0.0, "PE1": 0.0, "PE2": 0.0, "PE3": 0.0,
           "outliers": 0.0, "AAE": 0.0, "it": 0}
    for pred, label, mask, chunk in zip(preds, labels, masks, chunks):
        if mask_events:
            event_mask = torch.sum(torch.sum(chunk, dim=1), dim=1,
                                   keepdim=True).bool()
            mask = mask * event_mask
        aee = ref_loss_mod.AEE(pred, label, mask, flow_scaling)()
        # the reference's AAE only executes at batch_size 1: it returns a
        # 1-TUPLE, so val_metric[batch] raises IndexError for batch >= 1
        # (and its [B,H,W]x[B,1,H,W] mask product broadcasts wrongly at B>1)
        aae = (ref_loss_mod.AAE(pred, label, mask, flow_scaling)()
               if batch_size == 1 else None)
        for b in range(batch_size):
            val["it"] += 1
            val["AEE"] += float(aee[0][b])
            val["PE1"] += float(aee[1][b])
            val["PE2"] += float(aee[2][b])
            val["PE3"] += float(aee[3][b])
            val["outliers"] += float(aee[4][b])
            if aae is not None:
                val["AAE"] += float(aae[b])
    n = val.pop("it")
    return {k: v / n for k, v in val.items()}, n


def _sparse_item(rng, bins=10, h=96, w=96):
    chunk = rng.randn(bins, h, w) * 0.5
    # sparse footprint so mask_events actually bites: zero out most pixels
    chunk *= rng.rand(1, h, w) < 0.3
    mask = (rng.rand(h, w) > 0.3).astype(np.float64)
    label = rng.randn(2, h, w)
    return chunk, mask, label


def test_eval_loop_parity_snn(f64):
    """MVSEC-protocol composition: batch 1, mask_events True, [AEE, AAE],
    eval-mode BN, spike_th binarize."""
    torch = f64
    import importlib
    sys.path.insert(0, "/root/reference")
    ref_loss_mod = importlib.import_module("loss.flow_supervised")
    ref_snn, _ = import_reference_models()

    from sdformerflow_tpu.data.dsec import batch_iterator
    from sdformerflow_tpu.models import get_model
    from sdformerflow_tpu.training import torch_interop as TI
    from sdformerflow_tpu.training.config import build_configs
    from sdformerflow_tpu.training.evaluate import (MetricsAccumulator,
                                                    make_metrics_fn)
    from sdformerflow_tpu.training.train_step import (TrainState,
                                                      make_eval_step)
    from sdformerflow_tpu.training.optim import build_optimizer

    m_cfg, s_cfg = _snn_cfg(
        "MS_SpikingformerFlowNet_en4", "psn", (1, 1, 1, 1), (2, 2, 4, 4),
        "MS_PED_Spiking_PatchEmbed_Conv_sfn", (96, 96))
    s_cfg["drop_path_rate"] = 0.0
    spike_th, flow_scaling = 0.05, 1.0

    rng = np.random.RandomState(7)
    items = [_sparse_item(rng) for _ in range(3)]

    # --- torch: the reference eval loop, model.eval() throughout
    functional = sj_functional()
    torch.manual_seed(0)
    tmodel = ref_snn.MS_SpikingformerFlowNet_en4(m_cfg.copy(), s_cfg.copy())
    tmodel.init_weights()
    functional.reset_net(tmodel)
    functional.set_step_mode(tmodel, "m")
    tmodel.double()
    # non-trivial running stats: eval-mode BN must actually be exercised
    # (init stats are the 0/1 identity, which can hide batch-vs-running
    # stat routing mistakes)
    sd = tmodel.state_dict()
    gen = torch.Generator().manual_seed(41)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            v.add_(0.05 * torch.randn(v.shape, generator=gen,
                                      dtype=v.dtype))
        elif k.endswith("running_var"):
            v.mul_(1.0 + 0.2 * torch.rand(v.shape, generator=gen,
                                          dtype=v.dtype))
    sd0 = {k: v.numpy().copy() for k, v in sd.items()}

    tmodel.eval()
    preds, labels, masks, chunks = [], [], [], []
    with torch.no_grad():
        for batch in batch_iterator(_ArrayDataset(items), 1,
                                    drop_last=False):
            functional.reset_net(tmodel)
            functional.set_step_mode(tmodel, "m")
            chunk = _encode_ref(torch, torch.from_numpy(batch["chunk"]),
                                spike_th=spike_th)
            pred = tmodel(chunk)["flow"][-1]
            preds.append(pred)
            labels.append(torch.from_numpy(batch["label"]))
            masks.append(torch.from_numpy(batch["mask"].astype(np.float64)))
            chunks.append(chunk)
    want, want_n = _ref_accumulate(torch, ref_loss_mod, preds, labels,
                                   masks, chunks, flow_scaling,
                                   mask_events=True, batch_size=1)

    # --- JAX: the drivers' own building blocks
    cfg = {"model": m_cfg, "swin_transformer": s_cfg, "loader": {}}
    mc, sc, spc = build_configs(cfg)
    fmodel = get_model(m_cfg["name"], mc, sc, spc)
    depths = tuple(s_cfg["swin_depths"])
    params0, bs0, _ = TI.convert_state_dict(
        sd0, num_stages=len(depths), max_depth=max(depths),
        num_encoders=len(depths), family="snn")
    tx = build_optimizer(lr=1e-4, steps_per_epoch=1)
    state = TrainState.create(apply_fn=fmodel.apply, params=params0,
                              batch_stats=bs0, tx=tx)

    with jax.enable_x64(True):
        eval_step = make_eval_step(polarity=True, norm_input="minmax",
                                   spike_th=spike_th, use_batch_stats=False)
        metrics_fn = make_metrics_fn(
            metric_names=["AEE", "AAE"], flow_scaling=flow_scaling,
            mask_events=True, polarity=True, norm_input="minmax",
            spike_th=spike_th)
        acc = MetricsAccumulator()
        for batch in batch_iterator(_ArrayDataset(items), 1,
                                    drop_last=False):
            chunk = jnp.asarray(batch["chunk"])
            flows = eval_step(state, chunk)
            acc.append(metrics_fn(flows[-1], jnp.asarray(batch["label"]),
                                  jnp.asarray(batch["mask"]), chunk),
                       chunk.shape[0])
        got = acc.results()

    assert got["num_samples"] == want_n
    for ours, ref in (("AEE", "AEE"), ("PE1", "PE1"), ("PE2", "PE2"),
                      ("PE3", "PE3"), ("outlier", "outliers"),
                      ("AAE", "AAE")):
        # rtol 1e-7: the metrics sit downstream of a full f64 forward where
        # conv/attention reduction-order noise is ~1e-8 rel; any semantic
        # mismatch in the composed protocol (BN mode, event mask, per-sample
        # accumulation) shows at >=1e-3
        np.testing.assert_allclose(got[ours], want[ref], rtol=1e-7,
                                   err_msg=f"metric {ours}")


@pytest.mark.parametrize("mask_events,norm_input,batch_size",
                         [(False, "minmax", 2),
                          (True, "minmax", 2),
                          (True, "std", 1)])
def test_metrics_accumulation_ab(f64, mask_events, norm_input, batch_size):
    """Accumulation + mask_events math A/B on synthetic predictions (no
    model): batch-global PE counts / per-sample valid vectors summed per
    sample then divided by the total count, and the encoded-footprint event
    mask — incl. the std-norm case where signed normalized values can
    cancel in the reference's double sum (our ``sum != 0`` must match
    ``bool(sum)``, not the per-entry footprint)."""
    torch = f64
    import importlib
    sys.path.insert(0, "/root/reference")
    ref_loss_mod = importlib.import_module("loss.flow_supervised")

    from sdformerflow_tpu.ops.normalization import encode_input
    from sdformerflow_tpu.training.evaluate import (MetricsAccumulator,
                                                    make_metrics_fn)

    rng = np.random.RandomState(11)
    n_batches, bins, h, w = 3, 4, 16, 16
    fs = 2.0
    batches = []
    for _ in range(n_batches):
        chunk = rng.randn(batch_size, bins, h, w)
        chunk *= rng.rand(batch_size, 1, h, w) < 0.4
        batches.append({
            "chunk": chunk,
            "pred": rng.randn(batch_size, 2, h, w) * 2,
            "label": rng.randn(batch_size, 2, h, w) * 2,
            "mask": (rng.rand(batch_size, 1, h, w) > 0.3).astype(np.float64),
        })

    # torch reference: encode in place, mask, AEE class, per-sample sums
    preds, labels, masks, chunks = [], [], [], []
    for b in batches:
        chunks.append(_encode_ref(torch, torch.from_numpy(b["chunk"].copy()),
                                  norm_input=norm_input))
        preds.append(torch.from_numpy(b["pred"]))
        labels.append(torch.from_numpy(b["label"]))
        masks.append(torch.from_numpy(b["mask"]))
    want, want_n = _ref_accumulate(
        torch, ref_loss_mod, preds, labels, masks, chunks, fs,
        mask_events=mask_events, batch_size=batch_size)

    metrics_fn = make_metrics_fn(
        metric_names=["AEE", "AAE"], flow_scaling=fs,
        mask_events=mask_events, polarity=True, norm_input=norm_input)
    acc = MetricsAccumulator()
    with jax.enable_x64(True):
        # sanity: our encoded chunk matches the torch-side encoding
        np.testing.assert_allclose(
            np.asarray(encode_input(jnp.asarray(batches[0]["chunk"]),
                                    norm_input=norm_input)),
            chunks[0].numpy(), rtol=1e-12)
        for b in batches:
            acc.append(metrics_fn(jnp.asarray(b["pred"]),
                                  jnp.asarray(b["label"]),
                                  jnp.asarray(b["mask"]),
                                  jnp.asarray(b["chunk"])), batch_size)
        got = acc.results()

    assert got["num_samples"] == want_n == n_batches * batch_size
    for ours, ref in (("AEE", "AEE"), ("PE1", "PE1"), ("PE2", "PE2"),
                      ("PE3", "PE3"), ("outlier", "outliers")):
        np.testing.assert_allclose(got[ours], want[ref], rtol=1e-11,
                                   err_msg=f"metric {ours}")
    if batch_size == 1:
        # the reference's AAE only executes at batch_size 1 (1-tuple
        # indexing + mask broadcast both fail at B>1)
        np.testing.assert_allclose(got["AAE"], want["AAE"], rtol=1e-11)
