"""Orbax-backed checkpoint save/load/resume.

Replaces the reference's MLflow-artifact checkpointing
(/root/reference/utils/utils.py:10-104): best-epoch model + training state
(optimizer/epoch), resumable by directory. Orbax writes sharded arrays
directly from device memory — no host gather needed on multi-chip meshes.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir: str, state, epoch: int, *,
                    metrics: Optional[dict] = None, max_to_keep: int = 3):
    """Save params/batch_stats/opt_state/step at ``epoch``."""
    mgr = _manager(ckpt_dir, max_to_keep)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload),
             metrics=metrics or {})
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, state, epoch: Optional[int] = None):
    """Restore into an existing TrainState template. Returns
    (state, restored_epoch)."""
    import dataclasses
    mgr = _manager(ckpt_dir)
    if epoch is None:
        epoch = mgr.latest_step()
    if epoch is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = mgr.restore(epoch, args=ocp.args.StandardRestore(template))
    mgr.close()
    state = dataclasses.replace(
        state, params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=restored["step"])
    return state, epoch
