"""Checkpoint / resume via orbax (async, sharding-aware).

Reference: the canonical lineage has no `tf.train.Saver` at all
(SURVEY.md §3.1 row 13 [R-med]) — checkpointing is a build obligation
(SURVEY.md §6.4): multi-host runs are SPMD-fragile, so recovery is
checkpoint-restart. TrainState (params incl. the vocab-sharded table, opt
state, step) is saved asynchronously every N steps with a keep-K policy;
restore is sharding-aware (each shard restores its own slice when a mesh and
abstract state are provided).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from dssm_tpu.train.state import TrainState


class Checkpointer:
    def __init__(self, workdir: str, keep: int = 3, async_save: bool = True):
        path = os.path.join(os.path.abspath(workdir), "checkpoints")
        os.makedirs(path, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                enable_async_checkpointing=async_save,
            ),
        )

    @property
    def directory(self) -> str:
        return str(self._mngr.directory)

    def save(self, step: int, state: TrainState, force: bool = False) -> bool:
        stale = None
        if ((self._mngr.should_save(step) or force)
                and step in self._mngr.all_steps()):
            # A fresh (non --resume) run into a workdir holding an older
            # checkpoint at the same step would crash at save time with
            # StepAlreadyExistsError. The re-trained state supersedes the
            # stale artifact — but delete-then-save would leave a window
            # with NO checkpoint if the process dies before the async save
            # commits. Instead move the old one aside and remove it only
            # AFTER the replacement is durable (cli/train additionally
            # clears stale checkpoint dirs up front on fresh runs).
            import shutil

            self._mngr.wait_until_finished()
            src = os.path.join(self.directory, str(step))
            stale = src + ".stale"
            shutil.rmtree(stale, ignore_errors=True)
            try:
                os.rename(src, stale)
                self._mngr.reload()  # refresh the manager's step cache
            except (OSError, AttributeError):
                stale = None
                self._mngr.delete(step)  # fallback: the old behavior
        ok = self._mngr.save(step, args=ocp.args.StandardSave(state),
                             force=force)
        if stale is not None:
            import shutil

            self._mngr.wait_until_finished()  # replacement is durable
            shutil.rmtree(stale, ignore_errors=True)
        return ok

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_like: TrainState,
                step: Optional[int] = None) -> Optional[TrainState]:
        """Restore into the structure/shardings of `state_like` (an abstract
        or concrete TrainState). Returns None when no checkpoint exists."""
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_like)
        return self._mngr.restore(step,
                                  args=ocp.args.StandardRestore(abstract))

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
