"""Checkpointing.

Two mechanisms, mirroring the reference's artifacts while adding resume:

- :func:`save_params_npz` / :func:`load_params_npz` — flat-key npz export of
  a param pytree; the portable analogue of the reference's
  ``best_model_<ts>.pt`` state_dict saves (10_FAME.py:861-864).
- :class:`Checkpointer` — orbax-backed train-state checkpointing (params +
  opt state + epoch + dynamic weights) enabling restart, which the reference
  lacks entirely (SURVEY §5: save-best-only, no resume).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["save_params_npz", "load_params_npz", "load_metadata_npz", "Checkpointer"]


def _flatten(tree, prefix=""):
    # One batched device_get for the whole tree: per-leaf np.asarray would
    # block on a device round-trip per leaf (~200 leaves x ~33 ms through
    # the axon tunnel for a full-geometry FAME param tree).
    tree = jax.device_get(tree)
    flat = {}
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in paths:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        flat[key] = np.asarray(leaf)
    return flat


_META_KEY = "__metadata_json__"


def save_params_npz(path: str, params, metadata: Optional[Dict] = None) -> None:
    """Flat-key npz export; ``metadata`` (JSON-serializable, e.g. the model
    geometry) rides along so checkpoints are self-describing."""
    flat = _flatten(params)
    if metadata is not None:
        import json

        flat[_META_KEY] = np.frombuffer(
            json.dumps(metadata).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_params_npz(path: str, like) -> Any:
    """Load into the structure of ``like`` (same flattened key order)."""
    data = np.load(path)
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path_keys, leaf in paths:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path_keys)
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves)


def load_metadata_npz(path: str) -> Optional[Dict]:
    """Metadata stored by :func:`save_params_npz` (None when absent)."""
    import json

    data = np.load(path)
    if _META_KEY not in data:
        return None
    return json.loads(bytes(data[_META_KEY].tolist()).decode())


class Checkpointer:
    """Orbax StandardCheckpointer wrapper for resumable training."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, step: int, state: Dict[str, Any]) -> str:
        path = os.path.join(self.directory, f"step_{step}")
        self._ckpt.save(path, state, force=True)
        # StandardCheckpointer commits asynchronously; block so the
        # checkpoint is durable before training proceeds (resume safety).
        self._ckpt.wait_until_finished()
        return path

    def restore(self, step: int, like: Dict[str, Any]) -> Dict[str, Any]:
        path = os.path.join(self.directory, f"step_{step}")
        return self._ckpt.restore(path, target=like)

    def save_aux(self, step: int, aux: Dict[str, Any]) -> str:
        """Sidecar for variable-shape state (RNG words, tracked histories)
        that the fixed-template orbax restore can't carry."""
        path = os.path.join(self.directory, f"aux_{step}.npy")
        np.save(path, np.asarray(aux, dtype=object), allow_pickle=True)
        return path

    def load_aux(self, step: int) -> Optional[Dict[str, Any]]:
        path = os.path.join(self.directory, f"aux_{step}.npy")
        if not os.path.exists(path):
            return None
        return np.load(path, allow_pickle=True).item()

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    steps.append(int(name.split("_", 1)[1]))
                except ValueError:
                    pass
        return max(steps) if steps else None
