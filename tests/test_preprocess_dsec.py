"""End-to-end tests of the offline DSEC preprocessor on a synthetic layout.

Parity targets: /root/reference/DSEC_dataloader/DSEC_dataset_preprocess.py
(voxel and cnt modes) — in particular the cnt layout of one [2, H, W] count
frame per equal-dt sub-window, stacked to [num_frames, 2, H, W]
(DSEC_dataset_preprocess.py:90-128).
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
import preprocess_dsec as PP  # noqa: E402


@pytest.fixture
def dsec_root(tmp_path):
    """Synthetic one-sequence DSEC tree: 2 GT windows of 100 ms each."""
    seq = "zurich_city_99_x"
    rng = np.random.default_rng(0)
    n = 5000
    t = np.sort(rng.integers(0, 200_000, n)).astype(np.int64)  # us
    x = rng.integers(0, PP.WIDTH, n).astype(np.uint16)
    y = rng.integers(0, PP.HEIGHT, n).astype(np.uint16)
    p = rng.integers(0, 2, n).astype(np.uint8)

    ev_dir = tmp_path / "train_events" / seq / "events" / "left"
    ev_dir.mkdir(parents=True)
    with h5py.File(ev_dir / "events.h5", "w") as f:
        for k, v in (("p", p), ("x", x), ("y", y), ("t", t)):
            f.create_dataset(f"events/{k}", data=v)
        ms = np.arange(0, 201)  # 0..200 ms
        f.create_dataset("ms_to_idx",
                         data=np.searchsorted(t, ms * 1000).astype(np.int64))
        f.create_dataset("t_offset", data=np.int64(0))
    with h5py.File(ev_dir / "rectify_map.h5", "w") as f:
        # identity rectification
        gy, gx = np.mgrid[0:PP.HEIGHT, 0:PP.WIDTH]
        f.create_dataset(
            "rectify_map",
            data=np.stack([gx, gy], axis=-1).astype(np.float32))

    flow_dir = tmp_path / "train_optical_flow" / seq / "flow"
    flow_dir.mkdir(parents=True)
    np.savetxt(flow_dir / "forward_timestamps.txt",
               np.array([[0, 100_000], [100_000, 200_000]], np.int64),
               delimiter=",", fmt="%d")
    return tmp_path, seq, (t, x, y, p)


def test_cnt_mode_emits_per_bin_frames(dsec_root):
    root, seq, (t, x, y, p) = dsec_root
    num_frames = 10
    PP.process_sequence(str(root), seq, events_input="cnt",
                        num_frames=num_frames)
    save_dir = (root / "saved_flow_data" / "event_tensors"
                / f"{num_frames:02d}frames" / "left" / seq)
    files = sorted(os.listdir(save_dir))
    assert files == [f"{seq}_0001.npy", f"{seq}_0002.npy"]

    chunk = np.load(save_dir / files[0])
    assert chunk.shape == (num_frames, 2, PP.HEIGHT, PP.WIDTH)
    assert chunk.dtype == np.float32

    # oracle: hard-binned integer-pixel counts per equal-dt sub-window,
    # channel 0 = ON (p==1), channel 1 = OFF
    w0 = (t >= 0) & (t < 100_000)
    dt = 100_000 / num_frames
    for f_idx in (0, num_frames - 1):
        m = w0 & (t >= f_idx * dt) & (t < (f_idx + 1) * dt)
        exp = np.zeros((2, PP.HEIGHT, PP.WIDTH), np.float32)
        np.add.at(exp, (1 - p[m].astype(int), y[m], x[m]), 1.0)
        np.testing.assert_array_equal(chunk[f_idx], exp)
    # total count equals number of window events
    assert chunk.sum() == w0.sum()


def test_voxel_mode_host_path_shapes(dsec_root):
    root, seq, _ = dsec_root
    PP.process_sequence(str(root), seq, events_input="voxel", num_frames=5,
                        on_device=False)
    save_dir = (root / "saved_flow_data" / "event_tensors" / "05bins"
                / "left" / seq)
    chunk = np.load(save_dir / f"{seq}_0001.npy")
    assert chunk.shape == (5, PP.HEIGHT, PP.WIDTH)
    assert np.isfinite(chunk).all() and np.abs(chunk).sum() > 0
