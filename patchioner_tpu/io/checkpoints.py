"""Checkpointing via Orbax — step + params + optimizer state.

A strict improvement over the reference's bare `torch.save(state_dict)` every
N epochs with no resume logic (src/decap/decoderTraining.py:355-359; SURVEY
§5): full train-state checkpoints, atomic writes, retention, and resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["CheckpointManager", "load_decap_from_train_dir",
           "load_mapper_from_train_dir", "save_params_npz",
           "load_params_npz"]


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


def load_decap_from_train_dir(directory: str, step: Optional[int] = None):
    """Restore ONLY the decoder params from a `train/cli.py` Orbax
    checkpoint dir — the round-trip the reference gets from
    torch.save/torch.load (decoderTraining.py:355-359 -> decap.py:207-218):
    a decoder trained with this framework's CLI plugs straight back into
    `Patchioner.from_config` via `decap_weights: <out_dir>`.

    Optimizer state is dropped. Returns `DecapParams`; raises
    FileNotFoundError when the dir holds no checkpoint."""
    from patchioner_tpu.models import decap as decap_mod

    mgr = CheckpointManager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(
            f"no Orbax checkpoint steps under {directory!r}"
        )
    # raw (template-free) restore: the train state is a plain dict of
    # {'params': {'gpt2', 'clip_project'}, 'opt_state', 'step'}
    raw = mgr.manager.restore(step)
    try:
        params = raw["params"]
        return decap_mod.DecapParams(
            gpt2=params["gpt2"], clip_project=params["clip_project"]
        )
    except (KeyError, TypeError) as e:
        raise ValueError(
            f"{directory!r} step {step} is not a decoder-training "
            f"checkpoint (expected a 'params' tree with gpt2/clip_project)"
        ) from e


def load_mapper_from_train_dir(directory: str, step: Optional[int] = None):
    """Restore ONLY the mapper params (raw dict) from a
    `train/prefix_cli.py` Orbax checkpoint dir — the ViECap/ClipCap
    equivalent of `load_decap_from_train_dir` (reference cycle:
    viecap/training/main.py:100-105 -> viecap/entrypoint.py:82-96)."""
    mgr = CheckpointManager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(
            f"no Orbax checkpoint steps under {directory!r}"
        )
    raw = mgr.manager.restore(step)
    try:
        return raw["params"]
    except (KeyError, TypeError) as e:
        raise ValueError(
            f"{directory!r} step {step} is not a prefix-training "
            f"checkpoint (no 'params' tree)"
        ) from e


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export (interchange format for inference-only weights)."""
    import jax
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {
        jax.tree_util.keystr(k): np.asarray(v) for k, v in flat
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # np.savez appends '.npz' to extension-less paths; normalize here so
    # save/load round-trip on the same path string.
    if not path.endswith(".npz"):
        path += ".npz"
    np.savez(path, **arrays)


def load_params_npz(path: str, template: Any) -> Any:
    import jax
    import numpy as np

    if not path.endswith(".npz") and not os.path.exists(path):
        path += ".npz"
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [data[jax.tree_util.keystr(k)] for k, _ in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )
