"""Shared eval-metric machinery for the DSEC/MVSEC evaluation drivers.

Implements the reference eval loops' exact metric protocol
(/root/reference/eval_DSEC_flow_SNN.py:128-310 and
/root/reference/eval_MV_flow_SNN.py:143-290):

- ``mask_events``: the event mask is the nonzero footprint of the ENCODED
  chunk — the tensor the model actually consumed, after polarity split,
  nonzero-minmax/std normalization and spike_th binarization
  (eval_DSEC_flow_SNN.py:237-240, eval_MV_flow_SNN.py:217-219:
  ``torch.sum(torch.sum(chunk, 1), 1, keepdim=True).bool()`` on the
  in-place-modified chunk). Notably the loaders' ``event_valid`` histogram
  mask (MDR_dataloader/MVSEC.py:145-150) is produced but never consumed by
  any reference script — it is NOT the eval mask.
- accumulation: metrics are per-SAMPLE values summed over every sample and
  divided by the total sample count at the end (eval_*.py:236-287), not a
  mean of per-batch means. Identical when every batch has the same size;
  for a ragged final batch (drop_last=False) the reference's fixed
  ``for batch in range(batch_size)`` indexing would raise IndexError, so
  counting actual samples is a sane extension of a case the reference
  cannot execute, not a deviation.
- no batch cap: the reference eval loops iterate the FULL dataloader;
  ``test.sample`` caps only the validation loops inside training
  (train_flow_parallel_supervised_SNN.py:478-480).

Metric conventions (loss/flow_supervised.py:108-175, A/B'd in
tests/test_losses.py): AEE is a per-sample vector; PE1/2/3/outlier are
batch-GLOBAL counts divided by the per-sample valid-count vector; AAE is a
batch-global scalar (returned as a 1-tuple) — the reference only ever runs
it at batch_size 1 (``val_metric[batch]`` on the 1-tuple and the
[B,H,W]x[B,1,H,W] mask broadcast both fail at B>1), where it equals the
per-sample AAE; we generalize its per-batch sum as ``AAE * B``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import aae_metric, aee_metrics
from ..ops.normalization import encode_input


def event_footprint_mask(mask, x):
    """Reference eval event mask: AND the GT-valid mask with the nonzero
    footprint of the encoded chunk ``x`` (eval_DSEC_flow_SNN.py:237-240,
    eval_MV_flow_SNN.py:217-219 — ``sum(sum(chunk,1),1,keepdim).bool()``).

    For the live 5D form ([B, bins, 2, H, W] after polarity split) this is
    exact: summing bins+polarity then ``!= 0`` equals torch's ``.bool()`` of
    the double sum, including std-normalization sign cancellations. The
    reference's 4D form (encoding='cnt') degenerates — its second
    ``sum(dim=1)`` collapses H, yielding a [B, 1, W] column mask that only
    broadcasts at B == 1 — so for 4D we apply the per-pixel footprint
    instead (the semantics the dead commented-out line at
    eval_DSEC_flow_SNN.py:238 intended)."""
    axes = (1, 2) if x.ndim == 5 else (1,)
    ev = x.sum(axis=axes) != 0
    return mask * ev[:, None].astype(mask.dtype)


def make_metrics_fn(*, metric_names=("AEE",), flow_scaling=1.0,
                    mask_events=False, encoding="voxel", polarity=True,
                    norm_input="minmax", spike_th=None):
    """Build the jitted per-batch metric reduction:
    ``fn(pred, label, mask, chunk) -> {name: device scalar SUM over the
    batch's samples}``. One dispatch per batch; scalars stay on device and
    are fetched once by :class:`MetricsAccumulator` after the loop
    (PERF_NOTES "Train-loop host pipeline").

    ``chunk`` is the RAW voxel chunk (pre-encoding, post-crop) and is only
    consumed when ``mask_events`` — the mask is recomputed from the encoded
    footprint with the same encode args as the eval step (see module
    docstring). Pass ``chunk=None`` when ``mask_events`` is False."""
    want_aae = "AAE" in tuple(metric_names)

    def _sums(pred, label, mask):
        b = pred.shape[0]
        stats = aee_metrics(pred, label, mask, flow_scaling)
        out = {k: stats[k].sum()
               for k in ("AEE", "PE1", "PE2", "PE3", "outlier")}
        if want_aae:
            out["AAE"] = aae_metric(pred, label, mask, flow_scaling) * b
        return out

    fn_plain = jax.jit(_sums)
    if not mask_events:
        return lambda pred, label, mask, chunk=None: fn_plain(
            pred, label, mask)

    @jax.jit
    def fn_masked(pred, label, mask, chunk):
        x = encode_input(chunk, encoding=encoding, polarity=polarity,
                         norm_input=norm_input, spike_th=spike_th)
        return _sums(pred, label, event_footprint_mask(mask, x))

    # chunk=None: raw-events mode voxelizes+crops inside the eval step, so
    # no host-side chunk exists; that combination has no reference
    # counterpart (the reference eval is offline-voxel only) — fall back to
    # the GT-valid mask alone.
    return lambda pred, label, mask, chunk=None: (
        fn_plain(pred, label, mask) if chunk is None
        else fn_masked(pred, label, mask, chunk))


class MetricsAccumulator:
    """Accumulates per-batch device metric sums; fetches once at the end.

    ``results()`` divides by the total SAMPLE count — the reference's
    ``val_results[metric]["metric"] / val_results[metric]["it"]`` where
    ``it`` advances once per sample (eval_DSEC_flow_SNN.py:258-287)."""

    def __init__(self):
        self._pending = []
        self._samples = 0

    def append(self, device_sums: dict, batch_size: int):
        self._pending.append(device_sums)
        self._samples += int(batch_size)

    @property
    def num_batches(self):
        return len(self._pending)

    def results(self) -> dict:
        if not self._pending:
            return {}
        fetched = jax.device_get(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *self._pending))
        out = {k: float(np.sum(v)) / self._samples
               for k, v in fetched.items()}
        out["num_batches"] = len(self._pending)
        out["num_samples"] = self._samples
        return out
