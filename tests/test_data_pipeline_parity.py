"""Data-pipeline A/B against the REFERENCE'S OWN loader code (VERDICT r2 #6).

Round 2 compared the data path against builder-written goldens; these tests
import the actual reference modules (MDR_dataloader/loader_utils.py,
DSEC_dataloader/event_representations.py — cv2/pandas/torch/h5py are all
importable here; numba/torchvision/hdf5plugin are stubbed in refharness) and
compare on synthesized fixtures:

- estimate_corresponding_gt_flow (iterated cv2.remap GT propagation)
- VoxelGrid.convert_CHW / convert_CHW_polarities (torch put_ scatter)
  INCLUDING float coords slightly out of range (per-corner mask semantics)
- events_to_voxel_grid_v2 and events_to_frames
- EventSequenceToVoxelGrid_Pytorch (e2vid voxelizer, pol both ways)
- FlowAugmentor / DenseSparseAugmentor spatial transform, driven through a
  scripted RNG feeding both sides the same draws (the reference uses legacy
  numpy.random.*, this repo a Generator — sequence-matched by patching)
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo/tests")
from refharness import import_reference_loaders  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from sdformerflow_tpu.data import loader_utils as my_lu  # noqa: E402
from sdformerflow_tpu.ops import voxel as my_voxel  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    ref_lu, ref_er = import_reference_loaders()
    return ref_lu, ref_er


def _smooth_flow(rng, n, h, w, scale=3.0):
    f = rng.standard_normal((n, h, w))
    for _ in range(2):  # cheap smoothing so remap chains stay in-image
        f = (f + np.roll(f, 1, -1) + np.roll(f, -1, -1)
             + np.roll(f, 1, -2) + np.roll(f, -1, -2)) / 5.0
    return (f * scale).astype(np.float64)


def test_estimate_corresponding_gt_flow(ref):
    ref_lu, _ = ref
    rng = np.random.default_rng(0)
    n, h, w = 6, 32, 40
    xf = _smooth_flow(rng, n, h, w)
    yf = _smooth_flow(rng, n, h, w)
    ts = np.cumsum(rng.uniform(0.8, 1.2, n + 1))
    for (t0, t1) in [(ts[1] + 0.2, ts[1] + 0.5),     # within one gt interval
                     (ts[1] + 0.1, ts[4] + 0.7)]:    # multi-interval chain
        wx, wy = ref_lu.estimate_corresponding_gt_flow(xf, yf, ts, t0, t1)
        gx, gy = my_lu.estimate_corresponding_gt_flow(xf, yf, ts, t0, t1)
        # cv2.remap works in float32 internally: 1e-4 is its rounding floor
        np.testing.assert_allclose(gx, wx, atol=1e-4)
        np.testing.assert_allclose(gy, wy, atol=1e-4)
        assert np.abs(wx).max() > 0


def _events(rng, n, h, w, oob=False):
    lo = -3.0 if oob else 0.0
    x = rng.uniform(lo, w - 1 + (3.0 if oob else 0.0), n)
    y = rng.uniform(lo, h - 1 + (3.0 if oob else 0.0), n)
    t = np.sort(rng.uniform(0.0, 1.0, n))
    p = rng.integers(0, 2, n).astype(np.float64)
    return x, y, t, p


@pytest.mark.parametrize("oob", [False, True])
def test_voxelgrid_convert_chw(ref, oob):
    _, ref_er = ref
    rng = np.random.default_rng(1)
    bins, h, w = 5, 24, 32
    x, y, t, p = _events(rng, 4000, h, w, oob)
    ev = {k: torch.from_numpy(v.astype(np.float32)) for k, v in
          dict(x=x, y=y, t=t, p=p).items()}
    want = ref_er.VoxelGrid((bins, h, w)).convert_CHW(ev).numpy()
    got = np.asarray(my_voxel.voxel_grid_signed(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
        num_bins=bins, height=h, width=w))
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert np.abs(want).sum() > 0


@pytest.mark.parametrize("oob", [False, True])
def test_voxelgrid_convert_chw_polarities(ref, oob):
    _, ref_er = ref
    rng = np.random.default_rng(2)
    bins, h, w = 4, 20, 28
    x, y, t, p = _events(rng, 3000, h, w, oob)
    ev = {k: torch.from_numpy(v.astype(np.float32)) for k, v in
          dict(x=x, y=y, t=t, p=p).items()}
    want = ref_er.VoxelGrid((bins, h, w)).convert_CHW_polarities(ev).numpy()
    got = np.asarray(my_voxel.voxel_grid_polarities(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
        num_bins=bins, height=h, width=w))
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert np.abs(want).sum() > 0


def test_events_to_voxel_grid_v2(ref):
    _, ref_er = ref
    rng = np.random.default_rng(3)
    bins, h, w = 5, 24, 32
    x, y, t, p = _events(rng, 5000, h, w, oob=False)
    x, y = np.floor(x), np.floor(y)
    # the reference's docstring says [N, 4] but the code indexes a DICT
    # (events['t'] etc., event_representations.py:331-344)
    ev = dict(x=x.copy(), y=y.copy(), t=t.copy(), p=p.copy())
    want = np.asarray(ref_er.events_to_voxel_grid_v2(
        ev, bins, h, w, normalize=True))
    got = np.asarray(my_voxel.events_to_voxel_grid_v2(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(t), jnp.asarray(p),
        num_bins=bins, height=h, width=w, normalize=True))
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert np.abs(want).sum() > 0


def test_events_to_frames(ref):
    """Reference events_to_frames is hard-coded to 480x640
    (event_representations.py:46); feed sensor-size coords."""
    _, ref_er = ref
    rng = np.random.default_rng(4)
    frames, h, w = 3, 480, 640
    n = 20000
    x = rng.uniform(0, w - 1, n)
    y = rng.uniform(0, h - 1, n)
    t = np.sort(rng.uniform(0, 1.0, n))
    p = rng.integers(0, 2, n)
    want = ref_er.events_to_frames(p.astype(np.int32), x.astype(np.float32),
                                   y.astype(np.float32), t, frames).numpy()
    got = np.asarray(my_voxel.events_to_frames(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(t, jnp.float32), jnp.asarray(p, jnp.float32),
        num_frames=frames, height=h, width=w))
    np.testing.assert_allclose(got, want, atol=1e-3)
    assert want.sum() > 0


@pytest.mark.parametrize("pol", [True, False])
def test_event_sequence_to_voxel_grid_pytorch(ref, pol):
    ref_lu, _ = ref
    rng = np.random.default_rng(5)
    bins, h, w = 5, 24, 32
    n = 4000
    ts = np.sort(rng.uniform(0, 1.0, n))
    x = rng.integers(0, w, n).astype(np.float64)
    y = rng.integers(0, h, n).astype(np.float64)
    p = rng.integers(0, 2, n).astype(np.float64)
    feats = np.stack([ts, x, y, p], axis=1)
    ref_seq = ref_lu.EventSequence(
        None, {"height": h, "width": w}, features=feats.copy())
    conv = ref_lu.EventSequenceToVoxelGrid_Pytorch(
        num_bins=bins, normalize=True, forkserver=False, pol=pol)
    want = conv(ref_seq).numpy()
    my_seq = my_lu.EventSequence(feats.copy(), h, w)
    got = my_lu.events_to_voxel_grid(my_seq, bins, normalize=True, pol=pol)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert np.abs(want).sum() > 0


class _ScriptedLegacy:
    """Replays a shared uniform stream through the legacy numpy.random API
    surface the reference augmentors use."""

    def __init__(self, seed):
        self.g = np.random.default_rng(seed)

    def rand(self, *shape):
        return self.g.random() if not shape else self.g.random(shape)

    def uniform(self, a, b):
        return self.g.uniform(a, b)

    def randint(self, a, b):
        return int(self.g.integers(a, b))


class _ScriptedGen:
    """Same stream through this repo's Generator-style calls."""

    def __init__(self, seed):
        self.g = np.random.default_rng(seed)

    def random(self):
        return self.g.random()

    def uniform(self, a, b):
        return self.g.uniform(a, b)

    def integers(self, a, b):
        return int(self.g.integers(a, b))


def _patch_legacy(monkeypatch, ref_lu, script):
    monkeypatch.setattr(ref_lu.numpy.random, "rand", script.rand)
    monkeypatch.setattr(ref_lu.numpy.random, "uniform", script.uniform)
    monkeypatch.setattr(ref_lu.numpy.random, "randint", script.randint)


@pytest.mark.parametrize("seed", [0, 3, 8])
def test_flow_augmentor_spatial(ref, monkeypatch, seed):
    ref_lu, _ = ref
    rng = np.random.default_rng(100 + seed)
    h, w, c = 64, 72, 5
    img1 = rng.standard_normal((h, w, c)).astype(np.float32)
    img2 = rng.standard_normal((h, w, c)).astype(np.float32)
    flow = rng.standard_normal((h, w, 2)).astype(np.float32) * 2
    ref_aug = ref_lu.FlowAugmentor((40, 48), do_flip=True)
    _patch_legacy(monkeypatch, ref_lu, _ScriptedLegacy(seed))
    w1, w2, wf = ref_aug.spatial_transform(img1.copy(), img2.copy(),
                                           flow.copy())
    my_aug = my_lu.FlowAugmentor((40, 48), do_flip=True,
                                 rng=_ScriptedGen(seed))
    g1, g2, gf = my_aug(img1.copy(), img2.copy(), flow.copy())
    np.testing.assert_allclose(g1, w1, atol=1e-5)
    np.testing.assert_allclose(g2, w2, atol=1e-5)
    np.testing.assert_allclose(gf, wf, atol=1e-5)


@pytest.mark.parametrize("seed", [1, 5])
def test_dense_sparse_augmentor_spatial(ref, monkeypatch, seed):
    ref_lu, _ = ref
    rng = np.random.default_rng(200 + seed)
    h, w, c = 64, 72, 5
    arrs = [rng.standard_normal((h, w, c)).astype(np.float32)
            for _ in range(4)]
    flow = rng.standard_normal((h, w, 2)).astype(np.float32) * 2
    ref_aug = ref_lu.DenseSparseAugmentor((40, 48), do_flip=True)
    _patch_legacy(monkeypatch, ref_lu, _ScriptedLegacy(seed))
    wants = ref_aug.spatial_transform(*(a.copy() for a in arrs),
                                      flow.copy())
    my_aug = my_lu.DenseSparseAugmentor((40, 48), do_flip=True,
                                        rng=_ScriptedGen(seed))
    gots = my_aug(*(a.copy() for a in arrs), flow.copy())
    assert len(wants) == len(gots)
    for wv, gv in zip(wants, gots):
        np.testing.assert_allclose(gv, wv, atol=1e-5)
