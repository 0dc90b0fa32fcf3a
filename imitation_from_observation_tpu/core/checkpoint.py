"""Checkpoint save/restore for pytrees and experiment state.

Capability match for the reference's two checkpoint systems: joblib-pickled RL
snapshots (``rllab/misc/logger.py:216-232``, modes all/last/gap/none) and
``tf.train.Saver`` translation-model checkpoints (``train_script.py:181``).
Here both are msgpack-free numpy archives: a flattened pytree of arrays plus a
json treedef — loadable anywhere, no pickle of code objects.
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(str(k) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def save_pytree(path: str, tree, step: int | None = None, meta: dict | None = None) -> None:
    """Save a pytree of arrays to ``<path>.npz`` (+ ``<path>.json`` metadata)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    paths, leaves, _ = _flatten_with_paths(tree)
    arrays = {f"a{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump({"paths": paths, "step": step, "meta": meta or {}}, f)


def load_pytree(path: str, like):
    """Restore arrays saved by :func:`save_pytree` into the structure of ``like``."""
    data = np.load(path + ".npz")
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = [data[f"a{i}"] for i in range(len(leaves_like))]
    for got, want in zip(leaves, leaves_like):
        if hasattr(want, "shape") and tuple(got.shape) != tuple(np.shape(want)):
            raise ValueError(f"checkpoint leaf shape {got.shape} != expected {np.shape(want)}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_meta(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f)


class SnapshotManager:
    """Iteration snapshots with the reference's all/last/gap/none policy."""

    def __init__(self, directory: str, mode: str = "last", gap: int = 1):
        if mode not in ("all", "last", "gap", "none"):
            raise ValueError(f"unknown snapshot mode {mode!r}")
        self.directory = directory
        self.mode = mode
        self.gap = gap
        os.makedirs(directory, exist_ok=True)

    def save(self, itr: int, tree, meta: dict | None = None) -> str | None:
        if self.mode == "none":
            return None
        if self.mode == "gap" and itr % self.gap != 0:
            return None
        name = "params" if self.mode == "last" else f"itr_{itr}"
        path = os.path.join(self.directory, name)
        save_pytree(path, tree, step=itr, meta=meta)
        return path

    def latest(self) -> str | None:
        best, best_itr = None, -1
        for fn in os.listdir(self.directory):
            m = re.fullmatch(r"itr_(\d+)\.json", fn)
            if m and int(m.group(1)) > best_itr:
                best_itr = int(m.group(1))
                best = os.path.join(self.directory, fn[: -len(".json")])
        if best is None and os.path.exists(os.path.join(self.directory, "params.json")):
            best = os.path.join(self.directory, "params")
        return best
