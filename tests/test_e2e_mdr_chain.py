"""Full MDR/MVSEC user chain on synthetic real-layout trees: MDR train
(.npz event pairs + best-density variants + .flo GT, on-the-fly
voxelization + RAFT augmentor) -> MVSEC validation (pandas-HDF event files
+ flowgt .npy) -> eval CLI with AEE metrics.

Reference surfaces: train_mdr_supervised_{ANN,SNN}.py over
MDR_dataloader/MDR.py:29-295 and eval_MV_flow_SNN.py over
MDR_dataloader/MVSEC.py:29-298. The ACTUAL CLI driver mains run here.

The event .h5 files are written through data.loader_utils.write_events_h5,
which matches pandas' fixed-format layout (pytables isn't installed in this
environment; real pandas-written MVSEC files read through the same
get_events_h5 fallback).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

yaml = pytest.importorskip("yaml")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from sdformerflow_tpu.data.loader_utils import write_events_h5  # noqa: E402

RES = 64          # sensor resolution (square, small for CPU speed)
CROP = 32
BINS = 4
SEQ = "indoor_flying4"          # valid range (196, 570) — smallest table
FIRST = 196                     # VALID_TIME_INDEX[SEQ][0][0]


def _events_npz(path, rng, n=800):
    t0 = rng.uniform(0, 1e9)
    np.savez(path,
             t=(t0 + np.sort(rng.uniform(0, 5e7, n))).astype(np.float64),
             x=rng.integers(0, RES, n).astype(np.float64),
             y=rng.integers(0, RES, n).astype(np.float64),
             p=rng.integers(0, 2, n).astype(np.float64))


def _write_flo(path, flow_hw2):
    h, w, _ = flow_hw2.shape
    with open(path, "wb") as f:
        np.asarray([202021.25], np.float32).tofile(f)
        np.asarray([w, h], np.int32).tofile(f)
        flow_hw2.astype(np.float32).tofile(f)


@pytest.fixture(scope="module")
def mdr_mvsec_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mdr_raw")
    rng = np.random.default_rng(11)

    # ---- MDR train split: dt1/train/{events1,events2,best_density_*,flow}
    base = root / "dt1" / "train"
    for scene_i in range(6):
        scene = f"scene_{scene_i:02d}"
        (base / "events1" / scene).mkdir(parents=True, exist_ok=True)
        (base / "events2" / scene).mkdir(parents=True, exist_ok=True)
        for sub in ("best_density_events1", "best_density_events2", "flow"):
            (base / sub).mkdir(parents=True, exist_ok=True)
        _events_npz(base / "events1" / scene / f"{scene}_events1.npz", rng)
        _events_npz(base / "events2" / scene / f"{scene}_events2.npz", rng)
        _events_npz(base / "best_density_events1"
                    / f"{scene}_best_density_events1.npz", rng)
        _events_npz(base / "best_density_events2"
                    / f"{scene}_best_density_events2.npz", rng)
        flow = rng.uniform(-2, 2, size=(1, 1, 2)) * np.ones((RES, RES, 2))
        _write_flo(base / "flow" / f"{scene}_flow.flo", flow)

    # ---- MVSEC eval split: {root}/indoor_flying4/{event,flowgt_dt1}
    mv = root / SEQ
    (mv / "event").mkdir(parents=True)
    (mv / "flowgt_dt1").mkdir(parents=True)
    t_abs = 0.0
    for k in range(12):  # event files 000197.h5 .. 000208.h5
        n = 600
        ev = np.stack([
            t_abs + np.sort(rng.uniform(0, 0.05, n)),          # ts (s)
            rng.integers(0, RES, n).astype(np.float64),        # x
            rng.integers(0, RES, n).astype(np.float64),        # y
            rng.choice([0.0, 1.0], n)], axis=1)                # p
        write_events_h5(str(mv / "event" / f"{FIRST + 1 + k:06d}.h5"), ev)
        t_abs += 0.05
    for k in range(12):
        flow = (rng.uniform(-2, 2, size=(2, 1, 1))
                * np.ones((2, RES, RES))).astype(np.float32)
        np.save(mv / "flowgt_dt1" / f"{FIRST + k}.npy", flow)
    return root


def _write_config(tmp_path, root):
    cfg = yaml.safe_load((REPO / "configs" / "test_tiny_ann.yaml").
                         read_text())
    cfg["model"]["name"] = "MultiResUNet"
    cfg["model"]["num_encoders"] = 2
    cfg["model"]["base_num_channels"] = 16
    cfg["model"]["num_bins"] = BINS
    cfg["data"].update({"path": str(root), "num_frames": BINS,
                        "num_chunks": 1, "event_interval": "dt1",
                        "test_sequence": SEQ, "valid_sequence": SEQ})
    cfg["loader"].update({"resolution": [RES, RES], "crop": [CROP, CROP],
                          "batch_size": 2, "n_epochs": 1, "polarity": True})
    cfg["test"] = {"sample": 2, "n_valid": 1}
    path = tmp_path / "mdr_config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path


def test_h5_round_trip(tmp_path):
    from sdformerflow_tpu.data.loader_utils import get_events_h5
    rng = np.random.default_rng(0)
    data = np.stack([np.sort(rng.uniform(0, 1, 50)),
                     rng.integers(0, 64, 50).astype(float),
                     rng.integers(0, 64, 50).astype(float),
                     rng.choice([0.0, 1.0], 50)], axis=1)
    p = tmp_path / "w.h5"
    write_events_h5(str(p), data)
    np.testing.assert_array_equal(get_events_h5(str(p)), data)


def test_mdr_train_mvsec_eval_chain(mdr_mvsec_root, tmp_path, monkeypatch):
    cfg_path = _write_config(tmp_path, mdr_mvsec_root)
    run_dir = tmp_path / "run"

    import train_mdr  # noqa: E402
    import eval_mvsec  # noqa: E402

    monkeypatch.setattr(sys, "argv", [
        "train_mdr", "--config", str(cfg_path), "--run_dir", str(run_dir)])
    train_mdr.main()
    metrics = [json.loads(l) for l in
               (run_dir / "metrics.jsonl").read_text().splitlines()]
    names = {m["name"] for m in metrics}
    assert {"train_loss", "valid_loss"} <= names
    assert all(np.isfinite(m["value"]) for m in metrics)

    eval_run = tmp_path / "eval"
    # --max_batches: the eval loop now runs the FULL dataset by default
    # (reference semantics); the fixture materializes only the first 12
    # event/GT files of indoor_flying4's (196, 570) valid range
    monkeypatch.setattr(sys, "argv", [
        "eval_mvsec", "--train_config", str(cfg_path),
        "--ckpt", str(run_dir / "ckpt"), "--run_dir", str(eval_run),
        "--max_batches", "3"])
    eval_mvsec.main()
    results = json.loads((eval_run / "results.json").read_text())
    assert results["num_batches"] >= 1
    assert np.isfinite(results["AEE"])
