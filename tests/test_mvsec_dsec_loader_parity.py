"""A/B the DSECDatasetLite chunk assembly and the MVSEC event encoder
against the reference's own classes on tiny synthesized on-disk fixtures
(VERDICT r2 #6, remaining items).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from refharness import install_data_stubs, REFERENCE_ROOT  # noqa: E402

from sdformerflow_tpu.data.dsec import DSECDatasetLite  # noqa: E402


def _make_dsec_fixture(root, num_chunks, bins=4, h=12, w=16, n_items=3):
    rng = np.random.default_rng(0)
    seqs = ["thun_00_a"]
    os.makedirs(os.path.join(root, "gt_tensors"))
    os.makedirs(os.path.join(root, "mask_tensors"))
    os.makedirs(os.path.join(root, "sequence_lists"))
    ev_dir = os.path.join(root, "event_tensors", f"{bins:02d}bins", "left",
                          seqs[0])
    os.makedirs(ev_dir)
    names = []
    for i in range(n_items + 1):
        name = f"{seqs[0]}_{i:04d}.npy"
        names.append(name)
        np.save(os.path.join(root, "gt_tensors", name),
                rng.normal(0, 2, (2, h, w)).astype(np.float32))
        np.save(os.path.join(root, "mask_tensors", name),
                (rng.uniform(size=(h, w)) > 0.3))
        np.save(os.path.join(ev_dir, name),
                rng.normal(0, 1, (bins, h, w)).astype(np.float32))
    lists_dir = os.path.join(root, "sequence_lists")
    with open(os.path.join(lists_dir, "valid_split_seq.csv"), "w") as f:
        f.write("\n".join(names[:n_items]) + "\n")
    with open(os.path.join(lists_dir, "valid_split_doubleseq.csv"),
              "w") as f:
        f.write("\n".join(f"{a},{b}" for a, b in
                          zip(names[:-1], names[1:])) + "\n")


@pytest.mark.parametrize("num_chunks", [1, 2])
def test_dsec_dataset_lite_assembly(tmp_path, num_chunks):
    """Item-for-item equality (chunk incl. two-window concat, mask, label)
    vs the reference's DSECDatasetLite on the same fixture tree."""
    install_data_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import DSEC_dataloader.DSEC_dataset_lite as ref_dl

    root = str(tmp_path / "dsec")
    bins = 4
    _make_dsec_fixture(root, num_chunks, bins=bins)
    config = {
        "data": {"path": root, "num_frames": bins, "num_chunks": num_chunks,
                 "preprocessed": True},
        "model": {"encoding": "voxel"},
        "loader": {"resolution": [12, 16], "polarity": True},
    }
    ref_ds = ref_dl.DSECDatasetLite(config, "valid")
    my_ds = DSECDatasetLite(config, "valid")
    assert len(ref_ds) == len(my_ds) > 0
    for i in range(len(ref_ds)):
        rc, rm, rl = ref_ds[i]
        gc, gm, gl = my_ds[i]
        np.testing.assert_array_equal(np.asarray(rc), gc)
        np.testing.assert_array_equal(np.asarray(rm), gm)
        np.testing.assert_array_equal(np.asarray(rl), gl)
    if num_chunks == 2:
        assert gc.shape[0] == 2 * bins


def test_mvsec_encoder_window_slicing(tmp_path):
    """encode_events vs the reference's Events.generate_fimage: identical
    per-frame .h5 windows, INCLUDING the reference's frame-0 quirk
    (inds[i-1] negative-indexes the last frame -> empty window -> frame 0
    silently skipped when inds[-1] >= 0)."""
    import pandas as pd
    install_data_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import types
    import MDR_dataloader.MVSEC_encoder as ref_enc

    # pytables isn't installed here: patch DataFrame.to_hdf identically on
    # both sides so the windows land as raw arrays (the slicing semantics
    # are what this test pins; the storage container is incidental)
    def fake_to_hdf(self, path, key=None, **kw):
        with open(path, "wb") as f:
            np.save(f, self.to_numpy())

    orig_to_hdf = pd.DataFrame.to_hdf
    pd.DataFrame.to_hdf = fake_to_hdf

    rng = np.random.default_rng(1)
    n_events, n_frames, dt = 5000, 12, 1
    raw = np.stack([
        rng.integers(0, 346, n_events).astype(np.float64),   # x
        rng.integers(0, 260, n_events).astype(np.float64),   # y
        np.sort(rng.uniform(0, 1.0, n_events)),              # ts
        rng.choice([-1.0, 1.0], n_events)], axis=1)          # p
    inds = np.sort(rng.integers(0, n_events, n_frames)).astype(np.int64)
    inds[0] = -1  # MVSEC uses -1 for "before the first event"
    ts = np.linspace(0, 1, n_frames)

    ref_dir = str(tmp_path / "ref")
    os.makedirs(ref_dir)
    ref_enc.event_dir = ref_dir                # module globals the fn reads
    ref_enc.args = types.SimpleNamespace(save_env="t", sparse_print=True,
                                         data_split=0)
    ev = ref_enc.Events(n_events)
    ev.generate_fimage(input_event=raw, image_raw_event_inds_temp=inds,
                       image_raw_ts_temp=ts, dt_time_temp=dt)

    sys.path.insert(0, "/root/repo/scripts")
    import encode_mvsec
    my_dir = str(tmp_path / "mine")
    # our raw column order is (x, y, ts, p) == the h5 layout above
    encode_mvsec.encode_events(raw, inds, ts, my_dir, dt_time=dt)

    try:
        ref_files = sorted(os.listdir(ref_dir))
        my_files = sorted(os.listdir(my_dir))
        assert ref_files == my_files and len(ref_files) > 0
        for name in ref_files:
            with open(os.path.join(ref_dir, name), "rb") as f:
                a = np.load(f)
            with open(os.path.join(my_dir, name), "rb") as f:
                b = np.load(f)
            np.testing.assert_array_equal(a, b)
    finally:
        pd.DataFrame.to_hdf = orig_to_hdf
