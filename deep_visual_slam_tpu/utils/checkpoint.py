"""Orbax-backed checkpointing with auto-resume.

Replaces the reference's ``torch.save`` full-state dicts
(``vo/train.py:383-415``: epoch, model states, optimizer, scheduler, metrics
history, config, AMP scaler). The reference has **no resume logic** (training
always restarts at epoch 1, SURVEY.md §5.4); here ``restore_latest`` makes
checkpoint-based restart the recovery story, which is the standard failure
model for preemptible TPU jobs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ``orbax.CheckpointManager`` for TrainState trees.

    Saves {params, batch_stats, opt_state, step} plus a JSON-able metadata
    dict (epoch, config echo, metric history).
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state, metadata: Optional[Dict] = None) -> None:
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        args = {"state": ocp.args.StandardSave(tree)}
        if metadata is not None:
            args["metadata"] = ocp.args.JsonSave(metadata)
        self._mgr.save(step, args=ocp.args.Composite(**args))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, state) -> Tuple[Any, Optional[Dict], Optional[int]]:
        """Restore the newest checkpoint into the given state template.

        Returns (state, metadata, step); unchanged state if none exists.
        """
        step = self._mgr.latest_step()
        if step is None:
            return state, None, None
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        tree = restored["state"]
        metadata = restored.get("metadata")
        state = state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=tree["step"],
        )
        return state, metadata, step

    def close(self) -> None:
        self._mgr.close()


def load_latest_tree(directory: str):
    """Load the newest checkpoint's raw {params, batch_stats, opt_state,
    step} tree WITHOUT a state template (inference-side consumers: the SLAM
    ``Networks``, eval CLIs). Returns (tree, step) or None if empty."""
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    mgr = ocp.CheckpointManager(directory)
    try:
        step = mgr.latest_step()
        if step is None:
            return None
        tree = mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
        )["state"]
        return tree, step
    finally:
        mgr.close()


def save_params_only(params, path: str) -> None:
    """Bare-weights export (reference also writes per-epoch weight files)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params_only(path: str, template=None):
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))
