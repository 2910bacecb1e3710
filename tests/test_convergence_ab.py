"""Long-horizon convergence A/B harness guard (VERDICT r4 #2).

Reruns scripts/convergence_ab.py at 30 optimizer steps — the torch side is
the ACTUAL reference model/loss/clip/AdamW loop
(/root/reference/train_flow_parallel_supervised_SNN.py:229-336), the JAX
side this repo's real make_train_step — and asserts the f64 loss
trajectories stay within the recorded bound. The 300-step record lives in
docs/convergence_ab.json (PERF_NOTES "Long-horizon convergence A/B").
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.full
def test_convergence_ab_30_steps(tmp_path):
    out = tmp_path / "conv.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "convergence_ab.py"),
         "--steps", "30", "--size", "48", "64", "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    d = json.loads(out.read_text())
    div = d["f64_divergence"]
    # 300-step recorded max_rel is 4.6e-9; give the short run the same
    # order-of-magnitude headroom
    assert div["max_rel"] < 1e-7, div
    assert div["first_step_rel_gt_1e-06"] is None, div
    # the torch and JAX final eval AEEs must agree tightly in f64
    rel = abs(d["jax_f64_final_aee"] - d["torch_final_aee"]) / max(
        d["torch_final_aee"], 1e-9)
    assert rel < 1e-6, (d["torch_final_aee"], d["jax_f64_final_aee"])
