"""Checkpointing via Orbax — step + params + optimizer state.

A strict improvement over the reference's bare `torch.save(state_dict)` every
N epochs with no resume logic (src/decap/decoderTraining.py:355-359; SURVEY
§5): full train-state checkpoints, atomic writes, retention, and resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["CheckpointManager", "save_params_npz", "load_params_npz"]


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self.manager.save(
            step, args=self._ocp.args.StandardSave(state)
        )
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(state_template)
        )


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export (interchange format for inference-only weights)."""
    import jax
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {
        jax.tree_util.keystr(k): np.asarray(v) for k, v in flat
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_params_npz(path: str, template: Any) -> Any:
    import jax
    import numpy as np

    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [data[jax.tree_util.keystr(k)] for k, _ in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )
