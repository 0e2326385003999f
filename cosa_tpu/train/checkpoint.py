"""Checkpointing via orbax: full train-state save/restore + best-weights.

The reference only saves best-metric weights (best_seg.pth / best_cam.pth,
utils/torch_helper.py:101-117) and cannot resume training (no optimizer/
step/teacher state is ever persisted — SURVEY.md §5.4). Here the complete
TrainState (student, EMA teacher, optimizer, step, GMM queues) checkpoints
atomically, so a preempted run restarts exactly where it stopped.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _mgr(directory: str, keep: int = 2) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save_state(directory: str, state: Any, step: int, keep: int = 2) -> None:
    with _mgr(directory, keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    with _mgr(directory) as mgr:
        return mgr.latest_step()


def restore_state(directory: str, abstract_state: Any, step: Optional[int] = None) -> Any:
    with _mgr(directory) as mgr:
        step = mgr.latest_step() if step is None else step
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))


def save_best(directory: str, params: Any, comment: str, meta: dict) -> None:
    """Best-weights save (reference save_best, torch_helper.py:101-117):
    {output_dir}/best_{comment}/ holds the winning params + metadata.

    MUST be called by ALL processes: orbax saves are collective (they
    barrier via sync_global_processes); a rank-0-only call deadlocks a
    multihost run — caught by tests/test_multiprocess.py. Orbax itself
    writes from the primary host; only meta.json needs explicit gating."""
    path = os.path.abspath(os.path.join(directory, f"best_{comment}"))
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, "params"), params, force=True)
    ckpt.wait_until_finished()
    if jax.process_index() == 0:
        import json

        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)


def load_best(directory: str, comment: str, abstract_params: Any) -> Any:
    path = os.path.abspath(os.path.join(directory, f"best_{comment}", "params"))
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, abstract_params)
