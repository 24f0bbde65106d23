"""Checkpoint/resume with best-k policies (Orbax-backed).

Replicates the reference's checkpoint behaviors (SURVEY.md §5.4):
periodic snapshots, best-valid / best-train / best-train-valid tracking
(`UCIExperiments.py:172-189`), loss-history as the resume cursor
(`UCIExperiments.py:116-122`), and — unlike most of the reference's
scripts — always includes the optimizer state (`ToyExperiments.py:131-136`
is the only reference path that saves it).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # orbax is in the baked image; gate anyway for portability
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


@dataclasses.dataclass
class CheckpointManager:
    """Save/restore (params, opt_state, step, history) with best-k tags."""

    directory: str | Path
    max_to_keep: int = 5

    def __post_init__(self):
        # orbax/tensorstore require absolute paths
        self.directory = Path(self.directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        if _HAVE_ORBAX:
            self._mngr = ocp.CheckpointManager(
                self.directory / "steps",
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.max_to_keep, create=True
                ),
            )
        self._history_path = self.directory / "history.json"

    # --- core save/restore --------------------------------------------------

    def save(self, step: int, params: Any, opt_state: Any, history: Optional[dict] = None):
        state = {"params": params, "opt_state": opt_state}
        if _HAVE_ORBAX:
            self._mngr.save(step, args=ocp.args.StandardSave(state))
            self._mngr.wait_until_finished()
        else:  # pragma: no cover
            self._numpy_save(self.directory / "steps" / str(step), state)
        if history is not None:
            self._history_path.write_text(json.dumps(history))

    def restore(self, step: Optional[int] = None, template: Any = None):
        if _HAVE_ORBAX:
            step = step if step is not None else self._mngr.latest_step()
            if step is None:
                return None
            if template is not None:
                restored = self._mngr.restore(
                    step,
                    args=ocp.args.StandardRestore(template),
                )
            else:
                restored = self._mngr.restore(step)
            return step, restored["params"], restored["opt_state"]
        return None  # pragma: no cover

    def latest_step(self) -> Optional[int]:
        if _HAVE_ORBAX:
            return self._mngr.latest_step()
        return None  # pragma: no cover

    def delete_steps_from(self, first_bad_step: int):
        """Drop periodic checkpoints at/after ``first_bad_step`` — used when
        a resume rolls the history back (e.g. a pre-guard run saved NaN
        checkpoints); re-saving an existing step would otherwise collide."""
        if _HAVE_ORBAX:
            for s in list(self._mngr.all_steps()):
                if s >= first_bad_step:
                    self._mngr.delete(s)

    def load_history(self) -> dict:
        """The loss history doubles as the resume cursor
        (`UCIExperiments.py:116-122` semantics: cur_epoch = len(test_losses))."""
        if self._history_path.exists():
            return json.loads(self._history_path.read_text())
        return {"train": [], "valid": [], "test": []}

    # --- best-k tagged snapshots (`UCIExperiments.py:172-180`) --------------

    def save_best(self, tag: str, params: Any):
        path = self.directory / f"best_{tag}"
        self._numpy_save(path, {"params": params})

    def load_best(self, tag: str, template: Any):
        path = self.directory / f"best_{tag}"
        if not (path / "arrays.npz").exists():
            return None
        return self._numpy_load(path, {"params": template})["params"]

    # --- flat numpy fallback ------------------------------------------------

    @staticmethod
    def _numpy_save(path: Path, tree: Any):
        path.mkdir(parents=True, exist_ok=True)
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(path / "arrays.npz", *[np.asarray(x) for x in leaves])
        (path / "treedef.txt").write_text(str(treedef))

    @staticmethod
    def _numpy_load(path: Path, template: Any):
        leaves, treedef = jax.tree_util.tree_flatten(template)
        with np.load(path / "arrays.npz") as data:
            loaded = [data[k] for k in data.files]
        return jax.tree_util.tree_unflatten(treedef, loaded)


def save_params_npz(path: str | Path, params: Any, dtype=np.float16) -> Path:
    """Write a compact single-file parameter snapshot (default float16).

    Cross-round durability: Orbax step checkpoints (params + Adam moments,
    float32) are too large to commit for the 135M-param MNIST-geometry
    models, and uncommitted run state does not survive a round transition
    (the round-3 AR(1) gate run lost its checkpoints this way). A float16
    params-only snapshot halves the footprint twice over and warm-starts
    training or evaluation via :func:`load_params_npz` / the drivers'
    ``-load_npz`` flag (optimizer state starts fresh; the ~1e-3-relative
    float16 rounding is far below training noise at these scales).
    """
    path = Path(path)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    arrays = {f"leaf_{i}": np.asarray(x).astype(dtype) for i, x in enumerate(leaves)}
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, __treedef__=np.array(str(treedef)), **arrays)
    return path


def load_params_npz(path: str | Path, template: Any) -> Any:
    """Restore a :func:`save_params_npz` snapshot onto ``template``'s
    structure/dtypes. Leaf count and shapes must match the template — a
    mismatch means the snapshot came from a different model config."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as data:
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        if n != len(leaves):
            raise ValueError(
                f"{path}: snapshot has {n} leaves, template has {len(leaves)}"
            )
        new = []
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            # .shape/.dtype only — never np.asarray(leaf), which would pull
            # the (possibly 135M-param) device-resident template to host
            if tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"{path}: leaf_{i} shape {arr.shape} != template "
                    f"{leaf.shape}"
                )
            new.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new)


@dataclasses.dataclass
class BestTracker:
    """Track best-valid / best-train / best-train-valid checkpoints
    (the reference's three-way policy, `UCIExperiments.py:172-180`).

    Best params are held as (immutable) device arrays and written to disk
    only by :meth:`flush` — the reference's save-to-disk-per-improvement
    (`torch.save` each epoch) costs a full device->host transfer per epoch.
    ``CheckpointManager.load_best`` only reads files already on disk, so
    drivers MUST call ``flush()`` before it (or use :meth:`best_params`,
    which serves pending in-memory stashes directly).
    """

    manager: CheckpointManager
    best_train: float = float("inf")
    best_valid: float = float("inf")
    write_through: bool = False

    def __post_init__(self):
        self._pending: dict = {}

    def update(self, train_loss: float, valid_loss: float, params: Any):
        if train_loss < self.best_train:
            self.best_train = train_loss
            self._stash("train", params)
            if valid_loss < self.best_valid:
                self._stash("train_valid", params)
        if valid_loss < self.best_valid:
            self.best_valid = valid_loss
            self._stash("valid", params)

    def _stash(self, tag: str, params: Any):
        if self.write_through:
            self.manager.save_best(tag, params)
        else:
            # device-side copy: the caller's train step donates its params
            # buffers, so stashing the live reference would hold arrays the
            # next step deletes. jnp.copy stays async (no host round-trip).
            self._pending[tag] = jax.tree_util.tree_map(jnp.copy, params)

    def flush(self):
        for tag, params in self._pending.items():
            self.manager.save_best(tag, params)
        self._pending.clear()

    def best_params(self, tag: str, fallback: Any):
        """In-memory best params if tracked, else from disk, else fallback."""
        if tag in self._pending:
            return self._pending[tag]
        loaded = self.manager.load_best(tag, fallback)
        return loaded if loaded is not None else fallback
