#!/usr/bin/env python
"""Offline DSEC preprocessor: raw events.h5 + rectify_map.h5 + 16-bit flow
PNGs -> per-GT-window .npy tensors in the reference's saved_flow_data layout.

Replaces /root/reference/DSEC_dataloader/DSEC_dataset_preprocess.py. The
numba index scan becomes np.searchsorted; the trilinear voxel rasterization
runs on-device through ops.voxel (the same kernel that can voxelize raw
events inside the training input pipeline).

Output layout:
  {root}/saved_flow_data/event_tensors/{NN}bins/left/<seq>/<seq>_<idx:04d>.npy
  {root}/saved_flow_data/gt_tensors/<seq>_<idx:04d>.npy   ([2, H, W] float32)
  {root}/saved_flow_data/mask_tensors/<seq>_<idx:04d>.npy ([H, W] bool)

    python scripts/preprocess_dsec.py --root data/DSEC --sequence zurich_city_02_a \
        --input voxel --num_frames 10
"""

import argparse
import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

HEIGHT, WIDTH = 480, 640

TRAIN_SEQUENCES = [
    "zurich_city_09_a", "zurich_city_07_a", "zurich_city_02_c",
    "zurich_city_11_b", "thun_00_a", "zurich_city_02_d", "zurich_city_11_c",
    "zurich_city_03_a", "zurich_city_10_a", "zurich_city_05_b",
    "zurich_city_08_a", "zurich_city_01_a", "zurich_city_10_b",
    "zurich_city_02_e", "zurich_city_05_a", "zurich_city_06_a",
    "zurich_city_11_a", "zurich_city_02_a",
]
TEST_SEQUENCES = [
    "interlaken_00_b", "interlaken_01_a", "thun_01_a", "thun_01_b",
    "zurich_city_12_a", "zurich_city_14_c", "zurich_city_15_a",
]


class EventSlicer:
    """Random-access slicing of DSEC events.h5 by microsecond window using
    the ms_to_idx index (np.searchsorted replaces the reference's numba
    scan, event_representations.py:174-232)."""

    def __init__(self, h5f):
        self.h5f = h5f
        self.events = {k: h5f[f"events/{k}"] for k in ("p", "x", "y", "t")}
        self.t_offset = int(h5f["t_offset"][()]) if "t_offset" in h5f else 0
        if "ms_to_idx" in h5f:
            self.ms_to_idx = np.asarray(h5f["ms_to_idx"], np.int64)
        else:
            # rebuild the index with the C++ single-pass scan (the
            # reference's numba compute_ms_to_idx equivalent)
            from sdformerflow_tpu import native
            t_all = np.asarray(self.events["t"], np.int64)
            n_ms = int(t_all[-1] // 1000) + 2 if t_all.size else 1
            self.ms_to_idx = native.compute_ms_to_idx(t_all, n_ms)

    def get_events(self, t_start_us: int, t_end_us: int):
        t_start_us -= self.t_offset
        t_end_us -= self.t_offset
        ms0 = math.floor(t_start_us / 1000)
        ms1 = math.ceil(t_end_us / 1000)
        if ms1 >= self.ms_to_idx.size:
            return None
        i0, i1 = self.ms_to_idx[ms0], self.ms_to_idx[ms1]
        t_window = np.asarray(self.events["t"][i0:i1])
        lo = np.searchsorted(t_window, t_start_us, side="left")
        hi = np.searchsorted(t_window, t_end_us, side="left")
        out = {"t": t_window[lo:hi] + self.t_offset}
        for k in ("p", "x", "y"):
            out[k] = np.asarray(self.events[k][i0 + lo:i0 + hi])
        return out


def rectify_events(x, y, rectify_map):
    assert rectify_map.shape == (HEIGHT, WIDTH, 2), rectify_map.shape
    return rectify_map[y, x]


def create_flow_maps(sequence, flow_maps_path, save_flow, save_mask):
    """flow PNG16 -> ([2,H,W] float32, [H,W] bool) pairs:
    v = (png - 2^15)/128, channel 2 = valid."""
    import cv2
    os.makedirs(save_flow, exist_ok=True)
    os.makedirs(save_mask, exist_ok=True)
    for idx, name in enumerate(sorted(os.listdir(flow_maps_path)), start=1):
        img = cv2.imread(os.path.join(flow_maps_path, name),
                         cv2.IMREAD_UNCHANGED)[..., ::-1]
        flow_x = (img[..., 0].astype(float) - 2 ** 15) / 128.0
        flow_y = (img[..., 1].astype(float) - 2 ** 15) / 128.0
        valid = img[..., 2].astype(bool)
        flow = np.stack([flow_x, flow_y]).astype(np.float32)
        fname = f"{sequence}_{idx:04d}.npy"
        np.save(os.path.join(save_flow, fname), flow)
        np.save(os.path.join(save_mask, fname), valid)


def process_sequence(root, sequence, events_input="voxel", num_frames=10,
                     on_device=True, signed=True):
    import h5py

    ts_path = os.path.join(root, "train_optical_flow", sequence, "flow",
                           "forward_timestamps.txt")
    timestamps = np.loadtxt(ts_path, delimiter=",", dtype="int64")
    events_path = os.path.join(root, "train_events", sequence, "events",
                               "left")

    flow_dir = os.path.join(root, "train_optical_flow", sequence, "flow",
                            "forward")
    save_base = os.path.join(root, "saved_flow_data")
    if os.path.isdir(flow_dir):
        create_flow_maps(sequence, flow_dir,
                         os.path.join(save_base, "gt_tensors"),
                         os.path.join(save_base, "mask_tensors"))

    sub = {"voxel": f"{num_frames:02d}bins" if signed
           else f"{num_frames:02d}bins_pol",
           "cnt": f"{num_frames:02d}frames",
           "list": f"{num_frames:02d}lists"}[events_input]
    save_dir = os.path.join(save_base, "event_tensors", sub, "left", sequence)
    os.makedirs(save_dir, exist_ok=True)

    with h5py.File(os.path.join(events_path, "events.h5"), "r") as f, \
            h5py.File(os.path.join(events_path, "rectify_map.h5"), "r") as rf:
        slicer = EventSlicer(f)
        rectmap = rf["rectify_map"][()]

        voxelize = None
        if events_input == "voxel" and on_device:
            import jax
            from sdformerflow_tpu.ops import voxel as V

            fn = V.voxel_grid_signed if signed else V.voxel_grid_polarities
            voxelize = jax.jit(
                lambda x, y, t, p, valid, t_range: fn(
                    x, y, t, p, num_bins=num_frames, height=HEIGHT,
                    width=WIDTH, valid=valid, t_range=t_range))

        for idx in range(timestamps.shape[0]):
            t_beg, t_end = timestamps[idx]
            ev = slicer.get_events(int(t_beg), int(t_end))
            if ev is None:
                continue
            xy = rectify_events(ev["x"], ev["y"], rectmap)
            x_r, y_r = xy[:, 0], xy[:, 1]
            p = ev["p"].astype(np.float32)

            if events_input == "voxel":
                t = (ev["t"] - ev["t"][0]).astype("float32")
                t = t / t[-1] if t[-1] > 0 else t
                if voxelize is not None:
                    # bucket to bound recompiles on device
                    from sdformerflow_tpu.ops.voxel import pad_events
                    n = len(x_r)
                    bucket = 1 << max(n - 1, 1).bit_length()
                    xp, yp, tp, pp, valid = pad_events(
                        x_r.astype(np.float32), y_r.astype(np.float32), t, p,
                        bucket)
                    chunk = np.asarray(voxelize(
                        xp, yp, tp, pp, valid,
                        (np.float32(t[0]), np.float32(t[-1]))))
                else:
                    from sdformerflow_tpu.data.loader_utils import (
                        EventSequence, events_to_voxel_grid)
                    seq = EventSequence(
                        np.stack([t, x_r, y_r, p], 1), HEIGHT, WIDTH)
                    chunk = events_to_voxel_grid(seq, num_frames,
                                                 normalize=False, pol=True)
            elif events_input == "cnt":
                # reference cnt layout: one [2, H, W] count frame per equal-dt
                # sub-window, stacked to [num_frames, 2, H, W] (channel 0 = ON)
                # — DSEC_dataset_preprocess.py:90-128 slicing each sub-window
                # through cumulate_spikes_into_frames
                # (event_representations.py:33-43).
                dt = (t_end - t_beg) / num_frames
                t_ev = ev["t"].astype(np.float64)
                in_bounds = ((x_r >= 0) & (x_r < WIDTH)
                             & (y_r >= 0) & (y_r < HEIGHT))
                chunk = np.zeros((num_frames, 2, HEIGHT, WIDTH), np.float32)
                for f in range(num_frames):
                    # EventSlicer.get_events half-open window [start, end)
                    m = (in_bounds & (t_ev >= t_beg + f * dt)
                         & (t_ev < t_beg + (f + 1) * dt))
                    xi = x_r[m].astype(int)
                    yi = y_r[m].astype(int)
                    pi = p[m].astype(int)
                    np.add.at(chunk[f], (1 - pi, yi, xi), 1.0)
            elif events_input == "list":
                t = (ev["t"] - t_beg) / (t_end - t_beg)
                chunk = np.array([{"p": ev["p"], "t": t, "x": x_r,
                                   "y": y_r}], dtype=object)
            np.save(os.path.join(save_dir,
                                 f"{sequence}_{idx + 1:04d}.npy"), chunk)


def write_split_csvs(root, train_sequences, valid_sequences,
                     events_input="voxel", num_frames=10, signed=True):
    """Generate ``saved_flow_data/sequence_lists/{train,valid}_split_seq.csv``
    (and the ``_split_doubleseq.csv`` consecutive-pair variants) from the
    tensors produced by :func:`process_sequence`.

    The reference reads these CSVs from the dataset directory but never
    generates them (DSEC_dataset_lite.py:68-76 assumes they exist) — this
    closes that gap so a user can go from raw DSEC downloads to training
    with this repo alone. Rows are event-tensor file names; a doubleseq row
    pairs two consecutive GT windows of the same sequence (the reference
    concatenates chunk1+chunk2 along bins and takes label/mask from the
    second file, DSEC_dataset_lite.py:107-121).

    Only windows whose GT flow/mask tensors exist are listed (test-server
    sequences have no GT and get no rows).
    """
    import csv

    save_base = os.path.join(root, "saved_flow_data")
    sub = {"voxel": f"{num_frames:02d}bins" if signed
           else f"{num_frames:02d}bins_pol",
           "cnt": f"{num_frames:02d}frames",
           "list": f"{num_frames:02d}lists"}[events_input]
    lists_dir = os.path.join(save_base, "sequence_lists")
    os.makedirs(lists_dir, exist_ok=True)

    def rows_for(sequences):
        single, double = [], []
        for seq in sequences:
            seq_dir = os.path.join(save_base, "event_tensors", sub, "left",
                                   seq)
            if not os.path.isdir(seq_dir):
                continue
            files = sorted(f for f in os.listdir(seq_dir)
                           if f.endswith(".npy"))
            with_gt = [f for f in files if os.path.isfile(
                os.path.join(save_base, "gt_tensors", f))]
            single.extend([f] for f in with_gt)
            gt = set(with_gt)
            for a, b in zip(files, files[1:]):
                # consecutive windows: _0007.npy followed by _0008.npy
                if (int(b.rsplit("_", 1)[1][:-4])
                        == int(a.rsplit("_", 1)[1][:-4]) + 1 and b in gt):
                    double.append([a, b])
        return single, double

    written = []
    for split, seqs in (("train", train_sequences),
                        ("valid", valid_sequences)):
        single, double = rows_for(seqs)
        for suffix, rows in ((f"{split}_split_seq.csv", single),
                             (f"{split}_split_doubleseq.csv", double)):
            path = os.path.join(lists_dir, suffix)
            with open(path, "w", newline="") as f:
                csv.writer(f).writerows(rows)
            written.append((path, len(rows)))
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--sequence", default=None,
                    help="one sequence; default: all train sequences")
    ap.add_argument("--input", default="voxel",
                    choices=["voxel", "cnt", "list"])
    ap.add_argument("--num_frames", type=int, default=10)
    ap.add_argument("--host", action="store_true",
                    help="voxelize on host numpy instead of the device")
    ap.add_argument("--make_lists", action="store_true",
                    help="after processing, write sequence_lists CSVs "
                         "(train/valid splits) from the produced tensors")
    ap.add_argument("--valid_seqs", default="zurich_city_05_a",
                    help="comma-separated sequences held out as the valid "
                         "split when --make_lists is set")
    args = ap.parse_args()

    sequences = [args.sequence] if args.sequence else TRAIN_SEQUENCES
    for seq in sequences:
        print(f"processing {seq}")
        process_sequence(args.root, seq, args.input, args.num_frames,
                         on_device=not args.host)

    if args.make_lists:
        valid = [s for s in args.valid_seqs.split(",") if s]
        train = [s for s in sequences if s not in valid]
        for path, n in write_split_csvs(args.root, train, valid,
                                        args.input, args.num_frames):
            print(f"wrote {path} ({n} rows)")


if __name__ == "__main__":
    main()
