"""Preemption-safe shutdown: SIGTERM mid-training must checkpoint the
current state and return cleanly, and --resume must continue from it.

The reference has no equivalent surface: a preempted run loses everything
since the last best-epoch MLflow save
(/root/reference/utils/utils.py:93-104); recovery is manual --resume from
that stale point (train_flow_parallel_supervised_SNN.py:147-148).
"""

import json
import os
import signal
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tests"))

from test_multihost import make_datasets, tiny_config  # noqa: E402

from sdformerflow_tpu.training.checkpoints import latest_epoch  # noqa: E402
from sdformerflow_tpu.training.train_loop import train  # noqa: E402


def test_sigterm_checkpoints_and_resumes(tmp_path):
    cfg = tiny_config()
    cfg["loader"]["n_epochs"] = 500  # far more than the timer allows
    train_ds, valid_ds = make_datasets(cfg)
    run_dir = str(tmp_path / "run")

    # Pre-ignore SIGTERM so a signal landing in the gap before train()
    # installs its handler cannot kill pytest; then fire repeatedly until
    # train() returns (the first shot to land inside train() is caught).
    prev_handler = signal.signal(signal.SIGTERM, signal.SIG_IGN)
    done = threading.Event()

    def _fire():
        while not done.wait(3.0):
            os.kill(os.getpid(), signal.SIGTERM)

    firer = threading.Thread(target=_fire, daemon=True)
    firer.start()
    try:
        t0 = time.time()
        state = train(cfg, train_ds, valid_ds, run_dir=run_dir)
        wall = time.time() - t0
    finally:
        done.set()
        firer.join()
        signal.signal(signal.SIGTERM, prev_handler)

    # returned early with a checkpoint at the interrupted epoch
    assert state is not None
    saved = latest_epoch(f"{run_dir}/ckpt")
    assert saved is not None and saved < cfg["loader"]["n_epochs"] - 1, (
        f"expected an early preemption checkpoint, got epoch {saved} "
        f"after {wall:.1f}s")
    metrics = [json.loads(line)
               for line in Path(run_dir, "metrics.jsonl").read_text()
               .splitlines()]
    assert any(m.get("name") == "preempted_at_epoch" for m in metrics)

    # resume continues past the preemption point without error
    cfg["loader"]["n_epochs"] = saved + 3
    state2 = train(cfg, train_ds, valid_ds, run_dir=run_dir, resume=True)
    assert state2 is not None
    metrics2 = [json.loads(line)
                for line in Path(run_dir, "metrics.jsonl").read_text()
                .splitlines()]
    resumed_epochs = [m["step"] for m in metrics2
                      if m.get("name") == "train_loss" and
                      m["step"] > saved]
    assert resumed_epochs, "resume ran no epochs past the preemption point"


def test_save_on_preempt_opt_out(tmp_path):
    """loader.save_on_preempt: false leaves SIGTERM handling untouched."""
    cfg = tiny_config()
    cfg["loader"]["n_epochs"] = 1
    cfg["loader"]["save_on_preempt"] = False
    train_ds, valid_ds = make_datasets(cfg)
    prev_handler = signal.getsignal(signal.SIGTERM)
    sentinel = lambda s, f: None  # noqa: E731
    signal.signal(signal.SIGTERM, sentinel)
    try:
        train(cfg, train_ds, valid_ds, run_dir=str(tmp_path / "run"))
        # train() must not have replaced the handler
        assert signal.getsignal(signal.SIGTERM) is sentinel
    finally:
        signal.signal(signal.SIGTERM, prev_handler)
