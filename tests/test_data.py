import os

import jax.numpy as jnp
import numpy as np
import pytest

from sdformerflow_tpu.data import loader_utils as LU
from sdformerflow_tpu.ops import voxel as V

pytestmark = pytest.mark.smoke


def _events(n=400, h=32, w=40, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 0.01, n))
    x = rng.uniform(0, w - 1, n)
    y = rng.uniform(0, h - 1, n)
    p = rng.integers(0, 2, n).astype(np.float64)
    p = 2 * p - 1  # loader convention: signed polarity
    return np.stack([t, x, y, p], axis=1)


def test_numpy_voxelizer_matches_device_voxelizer():
    """The host (numpy) and on-device (XLA scatter) t-bilinear voxelizers
    agree — the cross-implementation check the reference performs manually."""
    ev = _events()
    seq = LU.EventSequence(ev, 32, 40, timestamp_multiplier=1e6,
                           convert_to_relative=True)
    host = LU.events_to_voxel_grid(seq, 5, normalize=False, pol=True)

    f = seq.features
    p01 = (f[:, 3] > 0).astype(np.float32)  # device fn takes 0/1 polarity
    dev = V.events_to_voxel_grid_v2(
        jnp.asarray(f[:, 1], jnp.float32), jnp.asarray(f[:, 2], jnp.float32),
        jnp.asarray(f[:, 0], jnp.float32), jnp.asarray(p01),
        num_bins=5, height=32, width=40, normalize=False)
    np.testing.assert_allclose(np.asarray(dev), host, atol=1e-3)


def test_numpy_voxelizer_polarity_channels():
    ev = _events(seed=1)
    seq = LU.EventSequence(ev, 32, 40, timestamp_multiplier=1e6,
                           convert_to_relative=True)
    grid = LU.events_to_voxel_grid(seq, 5, normalize=False, pol=False)
    assert grid.shape == (5, 2, 32, 40)
    signed = LU.events_to_voxel_grid(seq, 5, normalize=False, pol=True)
    np.testing.assert_allclose(grid[:, 0] - grid[:, 1], signed, atol=1e-3)


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).normal(size=(8, 10, 2)).astype(np.float32)
    path = tmp_path / "test.flo"
    with open(path, "wb") as f:
        np.asarray([202021.25], np.float32).tofile(f)
        np.asarray([10], np.int32).tofile(f)
        np.asarray([8], np.int32).tofile(f)
        flow.tofile(f)
    got = LU.read_flo(str(path))
    np.testing.assert_allclose(got, flow)


def test_submission_png_roundtrip(tmp_path):
    from sdformerflow_tpu.utils.visualization import (read_flow_png,
                                                      write_flow_png)
    flow = np.random.default_rng(1).uniform(-50, 50, (2, 16, 20)).astype(
        np.float32)
    path = str(tmp_path / "sub.png")
    write_flow_png(path, flow)
    got, _ = read_flow_png(path)
    np.testing.assert_allclose(got, flow, atol=1 / 128.0)


def test_dense_sparse_augmentor_shapes():
    rng = np.random.default_rng(2)
    aug = LU.DenseSparseAugmentor((16, 20), min_scale=-0.1, max_scale=0.5,
                                  do_flip=True,
                                  rng=np.random.default_rng(0))
    img = rng.normal(size=(32, 40, 5)).astype(np.float32)
    flow = rng.normal(size=(32, 40, 2)).astype(np.float32)
    e1, e2, d1, d2, fl = aug(img, img.copy(), img.copy(), img.copy(), flow)
    assert e1.shape[:2] == (16, 20)
    assert fl.shape == (16, 20, 2)


def test_gt_flow_propagation_short_window():
    # dt shorter than the GT interval: linear scaling path
    h, w = 8, 8
    x_flow = np.ones((3, h, w))
    y_flow = np.zeros((3, h, w))
    ts = np.array([0.0, 1.0, 2.0, 3.0])
    fx, fy = LU.estimate_corresponding_gt_flow(x_flow, y_flow, ts, 0.0, 0.5)
    np.testing.assert_allclose(fx, 0.5 * np.ones((h, w)))
    np.testing.assert_allclose(fy, 0.0 * np.ones((h, w)))


def test_gt_flow_propagation_multi_interval():
    # constant 1-px-per-interval flow chained over two intervals ~ 2 px
    h, w = 16, 16
    x_flow = np.ones((4, h, w))
    y_flow = np.zeros((4, h, w))
    ts = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    fx, fy = LU.estimate_corresponding_gt_flow(x_flow, y_flow, ts, 0.0, 2.0)
    interior = fx[:, :-3]
    np.testing.assert_allclose(interior, 2.0 * np.ones_like(interior))


def test_dsec_synthetic_dataset_and_batching():
    from sdformerflow_tpu.data.dsec import (SyntheticEventFlowDataset,
                                            batch_iterator)
    ds = SyntheticEventFlowDataset(num_samples=5, num_bins=4, height=16,
                                   width=16)
    batches = list(batch_iterator(ds, 2))
    assert len(batches) == 2  # drop_last
    b = batches[0]
    assert b["chunk"].shape == (2, 4, 16, 16)
    assert b["mask"].shape == (2, 1, 16, 16)
    assert b["label"].shape == (2, 2, 16, 16)


def test_batch_iterator_workers_matches_serial():
    """The threaded fetch path (loader.n_workers, the reference's
    DataLoader(num_workers=...) counterpart) must yield batches IDENTICAL
    to the serial path — same composition, same order, byte-equal arrays —
    for both the preprocessed-chunk and raw-events dataset shapes."""
    from sdformerflow_tpu.data.dsec import (SyntheticEventFlowDataset,
                                            SyntheticEventListDataset,
                                            batch_iterator)

    chunk_ds = SyntheticEventFlowDataset(num_samples=7, num_bins=4,
                                         height=16, width=16)
    ev_ds = SyntheticEventListDataset(num_samples=7, num_bins=4, height=16,
                                      width=16, max_events=1 << 10)
    for ds in (chunk_ds, ev_ds):
        serial = list(batch_iterator(ds, 2, shuffle=True, seed=3))
        threaded = list(batch_iterator(ds, 2, shuffle=True, seed=3,
                                       workers=4))
        assert len(serial) == len(threaded) == 3
        for a, b in zip(serial, threaded):
            assert set(a) == set(b)
            for k in a:
                if isinstance(a[k], dict):
                    for kk in a[k]:
                        np.testing.assert_array_equal(a[k][kk], b[k][kk])
                else:
                    np.testing.assert_array_equal(a[k], b[k])


def test_batch_iterator_workers_propagates_errors():
    from sdformerflow_tpu.data.dsec import batch_iterator

    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, idx):
            if idx == 2:
                raise ValueError("boom")
            import numpy as _np
            return (_np.zeros((2, 4, 4), _np.float32),
                    _np.ones((4, 4), _np.float32),
                    _np.zeros((2, 4, 4), _np.float32))

    import pytest
    with pytest.raises(ValueError, match="boom"):
        list(batch_iterator(Boom(), 2, workers=2))
