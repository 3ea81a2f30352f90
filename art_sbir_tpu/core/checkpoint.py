"""Orbax checkpointing with resumable train state.

The reference only saves final torch state-dicts with no mid-run resume for
the triplet path (reference `utils.py:210-254`); pix2pix keeps epoch-tagged
checkpoints (reference `pix2pix_model.py:90-101`). Here every trainer
checkpoints a full pytree (params, optimizer state, batch stats, step) via
orbax, so any run resumes exactly.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for pytree train states."""

    def __init__(self, directory: Path | str, max_to_keep: int = 3):
        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = True) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self) -> None:
        self._mgr.close()


def save_pytree(path: Path | str, tree: Any) -> None:
    """One-shot save of a pytree (final model export)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: Path | str, tree_like: Any) -> Any:
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, tree_like)
    return ckptr.restore(path, abstract)
