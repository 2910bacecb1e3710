"""Run-to-run determinism: two same-seed trainings must produce
bit-identical parameters and loss curves.

Guards the whole pipeline against hidden nondeterminism — the threaded
host prefetch (parallel/mesh.py:host_prefetch) must stay order-preserving,
augmentation keys must derive from the config seed only, and the jitted
step must not depend on wall-clock or iteration timing. The reference
makes no such guarantee (torch DataLoader workers + cuDNN nondeterminism).
"""

import json
import sys
from pathlib import Path

import jax
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tests"))

from test_multihost import make_datasets, tiny_config  # noqa: E402

from sdformerflow_tpu.training.train_loop import train  # noqa: E402


def _run(tmp_path, tag):
    cfg = tiny_config()
    cfg["loader"]["n_epochs"] = 2
    # exercise the augmentation RNG path too (the multihost config
    # disables it for cross-process equality; here both runs are
    # single-process so keys must replay exactly)
    cfg["loader"]["augment"] = ["Horizontal", "Vertical"]
    cfg["loader"]["augment_prob"] = [0.5, 0.5]
    train_ds, valid_ds = make_datasets(cfg)
    state = train(cfg, train_ds, valid_ds,
                  run_dir=str(tmp_path / f"run_{tag}"))
    metrics = [json.loads(line) for line in
               (tmp_path / f"run_{tag}" / "metrics.jsonl")
               .read_text().splitlines()]
    losses = [m["value"] for m in metrics if m["name"] == "train_loss"]
    return state, losses


def test_same_seed_runs_are_bit_identical(tmp_path):
    s1, l1 = _run(tmp_path, "a")
    s2, l2 = _run(tmp_path, "b")
    assert l1 == l2, f"loss curves diverged: {l1} vs {l2}"
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves2 = jax.tree_util.tree_leaves(s2.params)
    assert len(leaves1) == len(leaves2) > 0
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
