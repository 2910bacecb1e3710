"""Subprocess entry for the real 2-process multi-host test
(tests/test_multihost.py). Not a pytest module.

Usage: python multihost_driver.py <process_id> <port> <out_dir>

Each process gets 2 virtual CPU devices; the pair forms a 4-device global
mesh over Gloo collectives. Trains the tiny SNN for 3 epochs on a shared
synthetic dataset; process 0 writes metrics.jsonl under <out_dir>/run.
"""

import json
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: repeat runs skip the multi-minute CPU compiles
# (also shrinks inter-process arrival skew at the first collective)
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/sdformerflow_test_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from sdformerflow_tpu.parallel import multihost as MH
    MH.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 4

    sys.path.insert(0, str(REPO / "tests"))
    from test_multihost import tiny_config, make_datasets
    from sdformerflow_tpu.training.train_loop import train

    config = tiny_config()
    train_ds, valid_ds = make_datasets(config)
    train(config, train_ds, valid_ds, run_dir=os.path.join(out_dir, "run"))
    if pid == 0:
        print(json.dumps({"ok": True}))


if __name__ == "__main__":
    main()
