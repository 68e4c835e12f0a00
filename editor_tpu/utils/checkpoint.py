"""Train-state checkpointing.

The reference saves model-only ``state_dict`` every CHECKPOINT_PERIOD and on
new-best mAP, with **no optimizer/scheduler/epoch state — no true resume**
(engine/processor.py:120-127, SURVEY.md §5.4). Here checkpoints are the FULL
train state (params + optimizer + OCFR centers + BN stats + PRNG + step) via
Orbax, with optional async save, giving exact resume — the substrate the
elastic supervisor (editor_tpu/parallel/elastic.py) restarts from.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Orbax-backed checkpoint manager keeping the latest K steps."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 use_async: bool = True):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               enable_async_checkpointing=use_async)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        import orbax.checkpoint as ocp
        if step in (self._mgr.all_steps() or []):
            return False  # periodic + best-mAP saves can land on the same step
        return self._mgr.save(step, args=ocp.args.StandardSave(state),
                              force=force)

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if template is not None:
            return self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def restore_eval_state(directory: str) -> tuple:
    """Restore (params, model_state) from an Orbax checkpoint directory,
    unwrapping the {"state": TrainState, "epoch": N} payload the training
    loop writes (engine/loop.py); a bare {"params", "model_state"} payload
    is also accepted. Shared by the test/serve/export CLIs."""
    mgr = CheckpointManager(directory, use_async=False)
    restored = mgr.restore()
    st = restored.get("state", restored)
    return st["params"], st["model_state"]


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export of a param/state pytree (portable, torch-free)."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        flat[jax.tree_util.keystr(kp)] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params_npz(path: str, template: Any) -> Any:
    data = np.load(path)
    leaves_with_path = jax.tree_util.tree_leaves_with_path(template)
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for kp, leaf in leaves_with_path:
        key = jax.tree_util.keystr(kp)
        arr = data[key]
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch at {key}: {arr.shape} vs {leaf.shape}")
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
