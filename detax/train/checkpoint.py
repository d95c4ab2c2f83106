"""Checkpoint / resume: full train state via Orbax.

Replaces the reference's weights-only ``BaseModel.save/load`` +
``model_best.pth.tar`` convention (``models/base.py:47-76``,
``utils.py:163-166``) with preemption-safe full-state checkpoints (params,
optimizer state, step, RNG) — async multi-host capable through Orbax.
The ``model_best`` copy convention is preserved via ``save(..., is_best=True)``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from detax.train.train_state import TrainState

BEST_NAME = "model_best"


def _globalize(tree):
    """Multi-host: host-local fully-replicated leaves (step, rng, host-built
    optimizer scalars) are not serializable — convert them to global arrays.
    Globally-sharded leaves (not fully addressable from one process) pass
    through untouched. No-op single-process."""
    if jax.process_count() == 1:
        return tree
    from orbax.checkpoint import utils as ocp_utils

    def fix(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return ocp_utils.fully_replicated_host_local_array_to_global_array(x)
        return x

    return jax.tree_util.tree_map(fix, tree)


class CheckpointManager:
    """Thin wrapper over Orbax's CheckpointManager.

    Layout: ``<directory>/<step>/`` for periodic saves plus
    ``<directory>/model_best/`` mirroring the reference's best-copy.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        # best-copy saves are synchronous: the async StandardCheckpointer's
        # metadata-commit thread races interpreter exit (observed live: a
        # dangling model_best.orbax-checkpoint-tmp + "cannot schedule new
        # futures after shutdown" at teardown, even after wait_until_finished)
        self._best = ocp.Checkpointer(ocp.StandardCheckpointHandler())

    def save(self, state: TrainState, is_best: bool = False, wait: bool = False) -> None:
        step = int(jax.device_get(state.step))
        state = _globalize(state)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if is_best:
            path = os.path.join(self.directory, BEST_NAME)
            self._best.save(path, args=ocp.args.StandardSave(state), force=True)
        if wait:
            self.wait()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore latest (or given) step into the shape/sharding of ``template``.

        Multi-host: host-local replicated template leaves come back as
        GLOBAL replicated arrays (read them via ``.addressable_shards``)."""
        if step is None:
            step = self._mgr.latest_step()
        assert step is not None, f"no checkpoint found in {self.directory}"
        return self._mgr.restore(step, args=ocp.args.StandardRestore(_globalize(template)))

    def restore_best(self, template: TrainState) -> TrainState:
        path = os.path.join(self.directory, BEST_NAME)
        return self._best.restore(path, args=ocp.args.StandardRestore(_globalize(template)))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._best.close()
        self._mgr.close()


def save_params(params: Any, path: str) -> None:
    """Weights-only save (the reference's 'pre-trained' mode analog)."""
    ocp.StandardCheckpointer().save(os.path.abspath(path), params, force=True)


def load_params(template: Any, path: str) -> Any:
    return ocp.StandardCheckpointer().restore(os.path.abspath(path), target=template)
