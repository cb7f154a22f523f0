"""Checkpoint/resume via orbax (SURVEY.md §6 "Checkpoint / resume").

The reference snapshots whole Keras models per epoch to h5
(bin/train.py ModelCheckpoint) and resumes with --snapshot. tdnet saves the
{params, batch_stats, opt_state, step} pytree with orbax (async-capable,
multi-host safe) under `{path}/{step}`; `latest_step` + `restore` give
resume-from-latest. Deployable-artifact conversion (the reference's
convert-model) is bin/convert_model.py, which strips optimizer state and
bundles inference config.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

__all__ = ["Checkpointer"]


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        """Save {params, batch_stats, opt_state, step} (async by default)."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(step, args=ocp.args.PyTreeSave(payload))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore into a TrainState template (shapes/dtypes from init)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        template = {
            "params": state_template.params,
            "batch_stats": state_template.batch_stats,
            "opt_state": state_template.opt_state,
            "step": state_template.step,
        }
        restored = self._mgr.restore(step, args=ocp.args.PyTreeRestore(item=template))
        return state_template.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def has_opt_state(self, step: Optional[int] = None) -> bool:
        """True if the saved snapshot carries a non-empty opt_state.

        Pipeline-mode snapshots (bin/train.py _MergedShim) store merged
        variables with opt_state={} — a full restore() into a regular
        TrainState template would fail on the tree-structure mismatch, so
        resume paths check this and fall back to restore_weights (the
        optimizer restarts, loudly)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        meta = self._mgr.item_metadata(step)
        tree = getattr(meta, "tree", meta)
        if not hasattr(tree, "get"):
            # a FRESH manager over an existing directory has no handler
            # registered yet and returns None metadata — a resume-time
            # manager is exactly that. Read the step's tree metadata with
            # a standalone PyTree handler instead. (Round-5 regression
            # caught by tests/train/test_resume_fidelity_slow.py: the old
            # `None -> {}` fallthrough silently classified EVERY resume
            # snapshot as optimizer-less and restarted Adam.)
            handler = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
            try:
                meta = handler.metadata(
                    os.path.join(self.directory, str(step), "default"))
            finally:
                handler.close()
            # StepMetadata -> .item_metadata (TreeMetadata) -> .tree (dict)
            meta = getattr(meta, "item_metadata", meta)
            tree = getattr(meta, "tree", meta)
        if not hasattr(tree, "get"):
            raise RuntimeError(
                f"cannot read checkpoint metadata for step {step} under "
                f"{self.directory}")
        import jax

        return bool(jax.tree.leaves(tree.get("opt_state", {})))

    def restore_weights(self, params_template, batch_stats_template,
                        step: Optional[int] = None):
        """Restore only {params, batch_stats} — lets evaluate/convert load a
        snapshot without reconstructing the exact optimizer (freeze masks,
        schedules) it was trained with."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        template = {
            "params": params_template,
            "batch_stats": batch_stats_template,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.PyTreeRestore(item=template, partial_restore=True)
        )
        return restored["params"], restored["batch_stats"]

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
