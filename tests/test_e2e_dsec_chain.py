"""Full DSEC user chain on a synthetic raw download: offline preprocess ->
split CSVs -> train CLI -> eval CLI -> test-server submission PNGs.

This is the plumbing a reference user runs across
DSEC_dataloader/DSEC_dataset_preprocess.py (offline tensors),
the shipped sequence_lists CSVs (DSEC_dataset_lite.py:68-76 — the reference
assumes they exist; scripts/preprocess_dsec.py --make_lists generates them),
train_flow_parallel_supervised_SNN.py and eval_DSEC_flow_SNN.py — here the
ACTUAL CLI driver mains are invoked on a raw-layout tree scaled down via the
preprocessor's HEIGHT/WIDTH constants (the 480x640 values are otherwise
hardcoded, DSEC_dataset_preprocess.py:13-14).
"""

import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
cv2 = pytest.importorskip("cv2")
yaml = pytest.importorskip("yaml")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))
sys.path.insert(0, str(REPO))
import preprocess_dsec as PP  # noqa: E402

H, W = 64, 96
N_WINDOWS = 6  # 100 ms GT windows per sequence


def _make_sequence(root, seq, seed):
    """One raw DSEC sequence: events.h5 + rectify_map.h5 + 16-bit flow
    PNGs + forward_timestamps.txt at the (patched) H x W resolution."""
    rng = np.random.default_rng(seed)
    n = 4000 * N_WINDOWS
    t = np.sort(rng.integers(0, N_WINDOWS * 100_000, n)).astype(np.int64)
    x = rng.integers(0, W, n).astype(np.uint16)
    y = rng.integers(0, H, n).astype(np.uint16)
    p = rng.integers(0, 2, n).astype(np.uint8)

    ev_dir = root / "train_events" / seq / "events" / "left"
    ev_dir.mkdir(parents=True)
    with h5py.File(ev_dir / "events.h5", "w") as f:
        for k, v in (("p", p), ("x", x), ("y", y), ("t", t)):
            f.create_dataset(f"events/{k}", data=v)
        ms = np.arange(0, N_WINDOWS * 100 + 1)
        f.create_dataset("ms_to_idx",
                         data=np.searchsorted(t, ms * 1000).astype(np.int64))
        f.create_dataset("t_offset", data=np.int64(0))
    with h5py.File(ev_dir / "rectify_map.h5", "w") as f:
        gy, gx = np.mgrid[0:H, 0:W]
        f.create_dataset("rectify_map",
                         data=np.stack([gx, gy], -1).astype(np.float32))

    flow_dir = root / "train_optical_flow" / seq / "flow"
    fwd = flow_dir / "forward"
    fwd.mkdir(parents=True)
    ts = np.stack([np.arange(N_WINDOWS) * 100_000,
                   (np.arange(N_WINDOWS) + 1) * 100_000], 1)
    np.savetxt(flow_dir / "forward_timestamps.txt", ts,
               delimiter=",", fmt="%d")
    flows = []
    for i in range(N_WINDOWS):
        fx = rng.uniform(-3, 3) * np.ones((H, W))
        fy = rng.uniform(-3, 3) * np.ones((H, W))
        valid = np.ones((H, W), np.uint16)
        valid[:2] = 0  # some invalid rows, like real GT
        rgb = np.stack([fx * 128 + 2 ** 15, fy * 128 + 2 ** 15,
                        valid], -1).astype(np.uint16)
        cv2.imwrite(str(fwd / f"{i:06d}.png"), rgb[..., ::-1])
        flows.append((fx, fy, valid.astype(bool)))
    return flows


@pytest.fixture(scope="module")
def dsec_chain(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsec_raw")
    train_seq, valid_seq = "zurich_city_97_t", "zurich_city_98_v"
    old = PP.HEIGHT, PP.WIDTH
    PP.HEIGHT, PP.WIDTH = H, W
    try:
        _make_sequence(root, train_seq, seed=1)
        valid_flows = _make_sequence(root, valid_seq, seed=2)
        for seq in (train_seq, valid_seq):
            PP.process_sequence(str(root), seq, "voxel", num_frames=10,
                                on_device=False)
        written = PP.write_split_csvs(str(root), [train_seq], [valid_seq])
    finally:
        PP.HEIGHT, PP.WIDTH = old
    return root, train_seq, valid_seq, valid_flows, written


def test_preprocess_outputs_and_split_csvs(dsec_chain):
    root, train_seq, valid_seq, valid_flows, written = dsec_chain
    base = root / "saved_flow_data"
    ev = base / "event_tensors" / "10bins" / "left" / train_seq
    assert len(list(ev.glob("*.npy"))) == N_WINDOWS
    chunk = np.load(ev / f"{train_seq}_0001.npy")
    assert chunk.shape == (10, H, W)
    gt = np.load(base / "gt_tensors" / f"{valid_seq}_0003.npy")
    fx, fy, valid = valid_flows[2]
    np.testing.assert_allclose(gt[0], fx, atol=1 / 128.0)
    np.testing.assert_allclose(gt[1], fy, atol=1 / 128.0)
    mask = np.load(base / "mask_tensors" / f"{valid_seq}_0003.npy")
    np.testing.assert_array_equal(mask, valid)

    counts = {os.path.basename(p): n for p, n in written}
    assert counts["train_split_seq.csv"] == N_WINDOWS
    assert counts["valid_split_seq.csv"] == N_WINDOWS
    # consecutive pairs within one sequence
    assert counts["train_split_doubleseq.csv"] == N_WINDOWS - 1
    rows = (base / "sequence_lists"
            / "train_split_doubleseq.csv").read_text().splitlines()
    assert rows[0].split(",") == [f"{train_seq}_0001.npy",
                                  f"{train_seq}_0002.npy"]


def _write_config(tmp_path, data_path):
    cfg = yaml.safe_load((REPO / "configs" / "test_tiny_snn.yaml").
                         read_text())
    cfg["data"]["path"] = str(data_path)
    cfg["loader"]["resolution"] = [H, W]
    cfg["loader"]["crop"] = [48, 64]
    cfg["loader"]["batch_size"] = 2
    cfg["loader"]["n_epochs"] = 1
    path = tmp_path / "chain_config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path


def _run_main(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [module.__name__] + argv)
    module.main()


def test_train_eval_submission_chain(dsec_chain, tmp_path, monkeypatch):
    root, *_ = dsec_chain
    data_path = root / "saved_flow_data"
    cfg_path = _write_config(tmp_path, data_path)
    run_dir = tmp_path / "run"

    import train_dsec  # noqa: E402
    import eval_dsec  # noqa: E402

    _run_main(train_dsec, ["--config", str(cfg_path),
                           "--run_dir", str(run_dir)], monkeypatch)
    metrics = [json.loads(l) for l in
               (run_dir / "metrics.jsonl").read_text().splitlines()]
    names = {m["name"] for m in metrics}
    assert {"train_loss", "valid_loss"} <= names
    assert all(np.isfinite(m["value"]) for m in metrics)
    assert (run_dir / "ckpt").is_dir()

    eval_run = tmp_path / "eval"
    _run_main(eval_dsec, ["--train_config", str(cfg_path),
                          "--ckpt", str(run_dir / "ckpt"),
                          "--run_dir", str(eval_run),
                          "--store_submission"], monkeypatch)
    results = json.loads((eval_run / "results.json").read_text())
    assert results["num_batches"] >= 1
    assert np.isfinite(results["AEE"]) and np.isfinite(results["AAE"])

    # DSEC test-server submission PNGs round-trip at 1/128 px quantization
    from sdformerflow_tpu.utils.visualization import read_flow_png
    subs = sorted((eval_run / "vis" / "submission").glob("*.png"))
    assert len(subs) >= 1
    flow, _ = read_flow_png(str(subs[0]))
    assert flow.shape == (2, 48, 64)
    assert np.isfinite(flow).all()

    # resume path continues from the written checkpoint
    _run_main(train_dsec, ["--config", str(cfg_path),
                           "--run_dir", str(run_dir), "--resume",
                           "--max_steps", "2"], monkeypatch)
