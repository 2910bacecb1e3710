"""Experiment logging: JSONL metrics + params, with optional MLflow.

The reference logs everything through MLflow
(/root/reference/utils/mlflow.py, utils/utils.py:107-139). Here the primary
sink is plain JSONL files under a run directory (robust with zero deps);
if ``mlflow`` is importable and MLFLOW_TRACKING_URI is configured, metrics
mirror there too.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class RunLogger:
    def __init__(self, run_dir: str, config: Optional[dict] = None,
                 use_mlflow: bool = False, enabled: bool = True):
        """``enabled=False`` makes every method a no-op — non-zero processes
        in multi-host training pass this so only process 0 writes files."""
        self.run_dir = run_dir
        self.enabled = enabled
        self._mlflow = None
        if not enabled:
            self._metrics_f = None
            return
        os.makedirs(run_dir, exist_ok=True)
        self._metrics_f = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        if config is not None:
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)
        if use_mlflow:
            try:
                import mlflow
                mlflow.start_run()
                if config is not None:
                    for section, vals in config.items():
                        mlflow.log_param(section, str(vals)[:500])
                self._mlflow = mlflow
            except Exception:
                self._mlflow = None

    def log_metric(self, name: str, value: float, step: int):
        if not self.enabled:
            return
        rec = {"ts": time.time(), "name": name, "value": float(value),
               "step": int(step)}
        self._metrics_f.write(json.dumps(rec) + "\n")
        self._metrics_f.flush()
        if self._mlflow is not None:
            self._mlflow.log_metric(name, float(value), step=step)

    def log_metrics(self, metrics: Dict[str, Any], step: int):
        for k, v in metrics.items():
            self.log_metric(k, v, step)

    def log_artifact_dict(self, name: str, payload: dict):
        if not self.enabled:
            return
        path = os.path.join(self.run_dir, name)
        with open(path, "w") as f:
            json.dump(payload, f, indent=2, default=str)

    def close(self):
        if self._metrics_f is not None:
            self._metrics_f.close()
        if self._mlflow is not None:
            self._mlflow.end_run()


def count_parameters(params) -> int:
    import jax
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def print_parameters(params, prefix=""):
    """Parameter-table printer (reference utils.print_parameters)."""
    import jax
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        print(f"{prefix}{name}: {leaf.shape} = {leaf.size}")
