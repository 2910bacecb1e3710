"""Multi-host training support (parallel/multihost.py).

Unit level: index sharding, global-shuffle resharding, single-process
degenerate paths. Integration level: a REAL 2-process run (Gloo collectives
over localhost, 2 virtual CPU devices per process -> 4-device global mesh)
through training.train_loop.train, whose metrics must match the
single-process dp4 run on the same data — the invariant that makes
multi-host a pure scaling knob.

The reference has no multi-process training at all (SURVEY §2.10: only
torch.nn.DataParallel; an unused DistributedSampler import).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from sdformerflow_tpu.parallel import multihost as MH  # noqa: E402

H, W = 32, 48


def tiny_config():
    """Pure-conv MultiResUNet — the multihost machinery is model-agnostic
    and this compiles in seconds (the SNN swin stack costs minutes per
    process on the 1-CPU rig, starving the subprocess timeout)."""
    import yaml
    cfg = yaml.safe_load((REPO / "configs" / "test_tiny_ann.yaml").
                         read_text())
    cfg["model"]["name"] = "MultiResUNet"
    cfg["model"]["num_encoders"] = 2
    cfg["model"]["base_num_channels"] = 16
    cfg["loader"]["resolution"] = [H, W]
    cfg["loader"]["crop"] = None
    cfg["loader"]["batch_size"] = 4
    cfg["loader"]["n_epochs"] = 3
    # augmentation keys are derived per process from the same seed but
    # applied to different local slices — statistically equivalent, not
    # bit-equal; disable for the exact-equality A/B
    cfg["loader"]["augment"] = []
    cfg["test"]["n_valid"] = 1
    cfg["test"]["sample"] = 4
    return cfg


def make_datasets(config):
    from sdformerflow_tpu.data.dsec import SyntheticEventFlowDataset
    res = config["loader"]["resolution"]
    kw = dict(num_bins=config["model"]["num_bins"], height=res[0],
              width=res[1])
    return (SyntheticEventFlowDataset(num_samples=4, seed=3, **kw),
            SyntheticEventFlowDataset(num_samples=4, seed=999, **kw))


def test_shard_indices_partition():
    parts = [list(MH.shard_indices(10, process_index=i, process_count=3))
             for i in range(3)]
    flat = [i for p in parts for i in p]
    assert len(flat) == len(set(flat)) == 9  # equal counts, disjoint
    assert all(len(p) == 3 for p in parts)


def test_process_sharded_dataset_reshard_is_global_permutation():
    base = list(range(10))
    shards = [MH.ProcessShardedDataset(base, process_index=i,
                                       process_count=2) for i in range(2)]
    for s in shards:
        s.reshard(seed=7)
    seen = [s[i] for s in shards for i in range(len(s))]
    assert sorted(seen) == base  # disjoint cover
    # the global order equals the seeded permutation (single-host
    # batch_iterator order), sliced contiguously
    perm = np.random.default_rng(7).permutation(10)
    assert seen == perm.tolist()


def test_single_process_degenerate_paths():
    import jax
    from sdformerflow_tpu.parallel import make_mesh
    mesh = make_mesh()
    batch = {"a": np.arange(16, dtype=np.float32).reshape(8, 2)}
    out = MH.global_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(out["a"]), batch["a"])
    assert len(out["a"].sharding.device_set) == 8
    rep = MH.replicate_global({"w": np.ones((3,))}, mesh)
    assert rep["w"].sharding.is_fully_replicated
    assert MH.process_mean(2.5) == 2.5
    m = MH.make_multihost_mesh()
    assert m.shape == {"data": len(jax.devices()), "model": 1}


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training_matches_single_process(tmp_path):
    """Real 2-process Gloo run == single-process dp4 run, metric for
    metric (loss is computed on the global batch via GSPMD either way)."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(REPO / "tests" / "multihost_driver.py"),
         str(i), str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=str(REPO)) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"

    multi = [json.loads(l) for l in
             (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]

    # single-process reference on the same data: dp4 over 4 of the 8
    # virtual devices (gcd(batch=4, 8 devices) = 4)
    from sdformerflow_tpu.training.train_loop import train
    config = tiny_config()
    train_ds, valid_ds = make_datasets(config)
    train(config, train_ds, valid_ds, run_dir=str(tmp_path / "single"))
    single = [json.loads(l) for l in
              (tmp_path / "single" / "metrics.jsonl").read_text()
              .splitlines()]

    def series(recs, name):
        return {r["step"]: r["value"] for r in recs if r["name"] == name}

    for name in ("train_loss", "valid_loss"):
        ms, ss = series(multi, name), series(single, name)
        assert set(ms) == set(ss)
        assert len(ms) >= (3 if name == "train_loss" else 1)
        for step in ss:
            np.testing.assert_allclose(ms[step], ss[step], rtol=2e-5,
                                       err_msg=f"{name}@{step}")
